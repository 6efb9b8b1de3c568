"""State-snapshot inspector: summarize / render / export a saved SLAM state.

The headless counterpart of the reference GUI's inspection surfaces — the
main window's status displays (surfel count, GPU memory, keyframe list;
gui_main_window.h:98-160), the keyframe dialog (gui_keyframe_dialog.cc), and
the render window's map view — operating directly on a `--save_state`
snapshot (io/state.py), no dataset or SLAM run required.

Usage:
  python -m badslam_tpu.snapshot_inspector state.npz
  python -m badslam_tpu.snapshot_inspector state.npz --render out/ --render_mode normals
  python -m badslam_tpu.snapshot_inspector state.npz --export_point_cloud map.ply
  python -m badslam_tpu.snapshot_inspector state.npz --export_poses traj.txt
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

_ACTIVATION_NAMES = {0: "active", 1: "covisible-active", 2: "inactive"}


def summarize(npz) -> str:
  lines = []
  version = int(npz["version"])
  lines.append(f"badslam_tpu state snapshot v{version}")

  cfg = json.loads(str(npz["config"]))
  from badslam_tpu.config import BadSlamConfig
  defaults = BadSlamConfig()
  nondefault = {k: v for k, v in cfg.items()
                if getattr(defaults, k, None) != v}
  lines.append(f"config: {len(cfg)} fields, non-default: "
               f"{json.dumps(nondefault, sort_keys=True)}")

  fp = npz["frame_poses"]
  t = fp[:, :3, 3]
  seg = np.linalg.norm(np.diff(t, axis=0), axis=1) if len(t) > 1 else [0.0]
  lines.append(
      f"trajectory: {len(fp)} frames, path length {np.sum(seg):.3f} m, "
      f"bbox {np.ptp(t, axis=0).round(3).tolist()} m")

  kf_poses = npz["kf_global_T_frame"]
  act = npz["kf_activation"]
  act_hist = {_ACTIVATION_NAMES.get(a, str(a)): int((act == a).sum())
              for a in np.unique(act)}
  covis = npz["kf_covis"]
  lines.append(
      f"keyframes: {len(kf_poses)} (activation {act_hist}); covisibility "
      f"mean degree {covis.sum(axis=1).mean():.1f}"
      if len(kf_poses) else "keyframes: 0")

  pos = npz["surfel_pos"]
  if len(pos):
    r = np.sqrt(np.maximum(npz["surfel_radius_sq"], 0.0))
    lines.append(
        f"surfels: {len(pos)}, radius median {np.median(r) * 1e3:.1f} mm, "
        f"bbox {np.ptp(pos, axis=0).round(3).tolist()} m")
  else:
    lines.append("surfels: 0")

  di = npz["depth_intr"]
  ci = npz["color_intr"]
  dw, dh = npz["depth_size"]
  cw, ch = npz["color_size"]
  lines.append(f"depth camera {dw}x{dh} fx={di[0]:.2f} fy={di[1]:.2f} "
               f"cx={di[2]:.2f} cy={di[3]:.2f}")
  lines.append(f"color camera {cw}x{ch} fx={ci[0]:.2f} fy={ci[1]:.2f} "
               f"cx={ci[2]:.2f} cy={ci[3]:.2f}")
  cf = npz["cfactor"]
  lines.append(
      f"depth deformation: a={float(npz['a']):.6f}, cfactor {cf.shape} "
      f"range [{cf.min():.5f}, {cf.max():.5f}], "
      f"baseline_fx={float(npz['baseline_fx']):.2f}")
  lines.append(
      f"BA: {int(npz['ba_iteration_count'])} iterations run, "
      f"{int(npz['num_planned_ba_iterations'])} planned pending")
  return "\n".join(lines)


def render_snapshot(npz, out_dir: str, mode: str = "color",
                    splat_half_extent_in_pixels: float = 3.0,
                    every: int = 1) -> int:
  """Render the snapshot's surfel map from its keyframe viewpoints."""
  import jax.numpy as jnp

  from badslam_tpu import render
  from badslam_tpu.geometry import se3
  from badslam_tpu.models import surfels as surfels_mod

  os.makedirs(out_dir, exist_ok=True)
  n = len(npz["surfel_pos"])
  s = surfels_mod.create(max(n, 1))._replace(
      pos=jnp.asarray(npz["surfel_pos"]),
      normal=jnp.asarray(npz["surfel_normal"]),
      radius_sq=jnp.asarray(npz["surfel_radius_sq"]),
      color=jnp.asarray(npz["surfel_color"]),
      desc=jnp.asarray(npz["surfel_desc"]),
      valid=jnp.ones((n,), bool),
      active=jnp.ones((n,), bool),
      count=jnp.asarray(n, jnp.int32),
  ) if n else surfels_mod.create(1)
  colors = render.surfel_display_colors(s, mode)
  cw, ch = (int(v) for v in npz["color_size"])
  intr = jnp.asarray(npz["color_intr"], jnp.float32)

  rendered = 0
  kf_poses = npz["kf_global_T_frame"]
  kf_frames = npz["kf_frame_index"]
  for k in range(len(kf_poses)):
    if k % max(1, every) != 0:
      continue
    f_T_g = jnp.asarray(se3.inverse(jnp.asarray(kf_poses[k])))
    depth, color, _ = render.render_surfel_splats(
        s.pos, colors, s.valid, f_T_g, intr, ch, cw,
        splat_half_extent_in_pixels)
    stem = os.path.join(out_dir, f"kf_{int(kf_frames[k]):06d}")
    color_u8 = np.clip(np.asarray(color) * 255.0, 0, 255).astype(np.uint8)
    render.save_preview_png(stem + "_color.png", color_u8)
    render.save_depth_png(stem + "_depth.png", np.asarray(depth))
    rendered += 1
  return rendered


def main(argv=None) -> int:
  p = argparse.ArgumentParser(
      description="Inspect a badslam_tpu state snapshot")
  p.add_argument("state", help="path to a --save_state .npz snapshot")
  p.add_argument("--render", default=None,
                 help="render keyframe-viewpoint previews into this dir")
  p.add_argument("--render_mode", default="color",
                 choices=["color", "normals", "descriptors", "activation"])
  p.add_argument("--splat_half_extent_in_pixels", type=float, default=3.0)
  p.add_argument("--render_every", type=int, default=1)
  p.add_argument("--export_point_cloud", default=None)
  p.add_argument("--export_poses", default=None,
                 help="write the snapshot's trajectory in TUM format")
  args = p.parse_args(argv)

  npz = np.load(args.state, allow_pickle=False)
  if str(npz["magic"]) != "BADSLAM_TPU":
    raise ValueError(f"{args.state}: not a badslam_tpu state snapshot")
  print(summarize(npz))

  if args.export_point_cloud:
    from badslam_tpu.io.state import save_point_cloud_ply
    col = np.clip(npz["surfel_color"] * 255.0, 0, 255).astype(np.uint8)
    save_point_cloud_ply(args.export_point_cloud, npz["surfel_pos"],
                         npz["surfel_normal"], col)
    print(f"wrote {len(col)} surfels to {args.export_point_cloud}")
  if args.export_poses:
    from badslam_tpu.io.dataset import save_tum_trajectory
    save_tum_trajectory(args.export_poses,
                        npz["frame_timestamps"].tolist(),
                        list(npz["frame_poses"].astype(np.float64)))
    print(f"wrote {len(npz['frame_poses'])} poses to {args.export_poses}")
  if args.render:
    n = render_snapshot(npz, args.render, args.render_mode,
                        args.splat_half_extent_in_pixels, args.render_every)
    print(f"rendered {n} keyframe previews into {args.render}")
  return 0


if __name__ == "__main__":
  raise SystemExit(main())
