"""Long-sequence end-to-end integration run (VERDICT round-1 item 3).

Drives the FULL real-time pipeline — parallel BA thread, parallel loop
detection, memory watchdog, BoW retrieval — over a 500-frame 640x480
TUM-format synthetic dataset with a genuine revisit (tum_synth loop
trajectory), then self-judges:

  * ATE RMSE of the exported trajectory against ground truth;
  * threading invariants: no orphaned loop-detector entries, finite poses
    everywhere, clean BA/detector shutdown;
  * loop-closure bookkeeping consistency (events paired with counters).

This replaces toy-scale config2 as the system-level gate: nothing below
hundreds of frames at full resolution surfaces threading, drift, or
retrieval failures. Protocol mirrors the reference's benchmark usage
(main.cc:610-793: frame loop + --export_poses + external ATE evaluation).

Usage: python benchmarks/long_sequence.py [--dataset DIR] [--frames 500]
           [--size 640x480] [--out report.json] [--sequential]
"""

from __future__ import annotations

import argparse
import faulthandler
import json
import os
import signal
import sys
import time

# `kill -USR1 <pid>` dumps all Python thread stacks to stderr — the hang
# diagnosis tool for tunnel-side waits (gdb/py-spy are not in this image).
faulthandler.register(signal.SIGUSR1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ensure_dataset(path, frames, size, noise=False, radius=0.25, loops=2.0,
                   occlusions=False, texture_period=None,
                   blackout_windows=None):
  from badslam_tpu.utils import tum_synth
  w, h = (int(v) for v in size.split("x"))
  # Default: TWO full circles of a small (0.25 m) orbit — the entire second
  # circle continuously revisits the first, so the loop-DETECTION path is
  # exercised throughout (one circle gives a ~1-keyframe revisit window at
  # the very end, which the k=1 temporal-consistency warm-up legitimately
  # rejects — measured round 2). Continuous covisibility also means
  # frame-to-model BA absorbs drift, so detections are correctly IGNORED.
  # Drift mode overrides to a wide excursion (radius 2 m, 1.15 loops): the
  # camera footprint (~2.7 m at 1 m range) loses all overlap with the start
  # region mid-circle, injected drift accumulates unobserved, and the final
  # revisit arc requires an APPLIED explicit closure.
  traj = tum_synth.loop_trajectory(frames, radius=radius, loops=loops)
  return tum_synth.write_tum_dataset(path, traj, width=w, height=h,
                                     sensor_noise=noise,
                                     occlusions=occlusions,
                                     texture_period=texture_period,
                                     blackout_windows=blackout_windows)


def make_biased_slam(slam_cls, bias_m_for_frame):
  """Wrap a BadSlam subclass so the tracked relative pose of frame i picks up
  a `bias_m_for_frame(i)`-meter translation bias (+x in the frame's local
  axes) — the synthetic stand-in for odometry error.

  Two schedules are used by this harness:

  * constant per-frame DRIFT (`--drift`): measures the system's absorption
    behavior. Measured result (round 2): per-keyframe frame-to-model BA
    re-snaps each keyframe against the covisible local map, so smooth drift
    well inside the association band (Tukey 10 x sigma ~= 0.25 m at 1 m
    depth) NEVER accumulates — 0.1 m of injected cumulative drift lands at
    0.13 mm final ATE with every loop candidate correctly ignored by the
    is-BA-enough test. That mirrors the reference: its 1-px reprojection
    test exists precisely because BA absorbs everything small
    (loop_detector.cc:624-666).

  Note the tracker re-derives base_T_frame from IMAGES each frame, so a
  per-frame bias does not accumulate within a keyframe interval — only the
  bias present at keyframe creation enters the keyframe chain. That is why
  `--kidnap` uses `make_kidnapped_slam` below instead of a bias schedule.
  """
  from badslam_tpu.geometry import se3_np

  class BiasedSlam(slam_cls):
    def run_odometry(self, frame_index, processed):
      super().run_odometry(frame_index, processed)
      b = bias_m_for_frame(frame_index)
      if b == 0.0 or not self.base_kf_tr_frame:
        return
      bias = np.eye(4, dtype=np.float32)
      bias[0, 3] = b
      # Post-compose the bias into the accepted relative pose and re-derive
      # everything run_odometry wrote from it (frame pose + motion-model
      # history), so the bias propagates into keyframes and the map.
      drifted = se3_np.orthonormalize(self.base_kf_tr_frame[-1] @ bias)
      self.base_kf_tr_frame[-1] = drifted
      self.frame_tr_base_kf[-1] = se3_np.inverse(drifted)
      with self._ba_lock:
        self.rgbd_video.frames[frame_index].global_T_frame = (
            self.base_kf_global_T_frame @ drifted)

    def _after_pipelined_tracking(self, frame_index):
      # Pipelined analog: post-compose the bias into the device history's
      # newest entry AND the recorded relative trajectory for this frame.
      b = bias_m_for_frame(frame_index)
      if b == 0.0:
        return
      import jax.numpy as jnp
      bias = np.eye(4, dtype=np.float32)
      bias[0, 3] = b
      drifted = self._pl.hist[2] @ jnp.asarray(bias)
      self._pl.hist = self._pl.hist.at[2].set(drifted)
      self._pl.traj_rel = self._pl.traj_rel.at[frame_index].set(drifted)

  return BiasedSlam


def make_kidnapped_slam(slam_cls, windows):
  """Wrap a BadSlam subclass so the sensor BLACKS OUT during each
  (start, end) frame window in `windows` — the realistic kidnap:
  a covered/obstructed camera makes the tracking-failure gate fire, the
  pose holds (constant-position fallback) while the real camera keeps
  moving, and the accumulated unobserved motion bakes into every later
  keyframe as a global offset.

  This exercises the production repair chain end to end: the gate fires
  through its REAL mechanism (run_odometry / pipelined.track_frame
  force_fail seam), the keyframe odometry edges formed during the blackout
  are marked low-confidence (system.keyframe_edge_weight /
  PipelinedState.edge_weight), and at the revisit the loop closure's pose
  graph localizes the correction at those weak edges instead of spreading
  it along the whole trajectory (loop/pose_graph.py odometry_weights).

  An offset injected out in non-covisible terrain cannot be re-snapped by
  BA (no associations bridge the jump; the association pull-in band is
  Tukey 10 x sigma ~= 0.25 m at 1 m depth) — only the detection -> RANSAC
  -> refinement -> pose-graph -> trajectory-deformation chain repairs it.

  Keyframe creation and loop-detection are SUPPRESSED inside the blackout:
  a covered lens yields unusable frames, so no map data exists for the
  window. (Measured at 640x480: if blackout keyframes ARE created from the
  real images at held poses, each is only ~0.03-0.3 m off — inside or at
  the association band — and frame-to-model BA incrementally re-snaps the
  whole chain, absorbing a 0.6 m kidnap to 4% ATE with zero closures.
  Genuinely impressive, but it would leave the closure path untested.)
  """

  class KidnappedSlam(slam_cls):
    def _tracking_failure_injected(self, frame_index):
      return any(s <= frame_index < e for (s, e) in windows)

    def create_keyframe(self, frame_index, processed):
      if self._tracking_failure_injected(frame_index):
        return
      super().create_keyframe(frame_index, processed)

    def _create_keyframe_pipelined(self, frame_index, processed):
      if self._tracking_failure_injected(frame_index):
        return
      super()._create_keyframe_pipelined(frame_index, processed)

  return KidnappedSlam


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--dataset", default="/tmp/badslam_long_seq")
  p.add_argument("--frames", type=int, default=500)
  p.add_argument("--size", default="640x480")
  p.add_argument("--keyframe_interval", type=int, default=10)
  p.add_argument("--sequential", action="store_true",
                 help="sequential BA + detection (deterministic baseline)")
  p.add_argument("--prewarm", action="store_true",
                 help="compile all program shapes before the timed loop"
                      " (slam.prewarm; kills mid-run compile spikes)")
  p.add_argument("--pipelined", action="store_true",
                 help="transfer-free pipelined front-end (zero device->host "
                      "transfers inside the frame loop; implies sequential "
                      "BA; see slam/pipelined.py)")
  p.add_argument("--concurrent_ba", action="store_true",
                 help="with --pipelined: run the transfer-free BA "
                      "iterations on a dedicated host thread off the frame "
                      "critical path (pipelined_concurrent_ba)")
  p.add_argument("--noise", action="store_true",
                 help="apply the Kinect-class sensor-noise model")
  p.add_argument("--occlusions", action="store_true",
                 help="occlusion-rich world: floating boxes add depth "
                      "discontinuities, occlusion shadows, and outlier "
                      "edge surfels (synthetic.occlusion_boxes)")
  p.add_argument("--drift", type=float, default=0.0, metavar="M_PER_FRAME",
                 help="inject constant odometry translation drift; gate "
                      "verifies BA ABSORBS it (e.g. 2e-4); also switches to "
                      "the wide-excursion trajectory")
  p.add_argument("--kidnap", type=float, default=0.0, metavar="METERS",
                 help="simulate a sensor blackout mid-excursion long enough "
                      "to accumulate this much unobserved motion (e.g. 0.6, "
                      "beyond the association band) so a loop closure must "
                      "actually FIRE and repair it via the weak-edge pose "
                      "graph; also switches to the wide-excursion trajectory")
  p.add_argument("--image_blackout", action="store_true",
                 help="with --kidnap: the blackout window is rendered as "
                      "REAL black frames (zero rgb, invalid depth) in the "
                      "dataset, and the system runs UNMODIFIED — no "
                      "keyframe suppression, no force_fail seam; the "
                      "tracking-failure gate, weak-edge marking, and "
                      "repair must all fire through their production "
                      "mechanisms (round-4 verdict item 6a)")
  p.add_argument("--double_kidnap", action="store_true",
                 help="with --kidnap: TWO blackout windows (at 35%% and "
                      "65%% of the run); gates require >=2 applied "
                      "closures — exercises the accumulated loop-edge "
                      "buffer (round-4 verdict item 6b)")
  p.add_argument("--alias_period", type=float, default=0.0,
                 help="perceptual-aliasing world: the texture repeats with "
                      "this period (m) while geometry stays unique; with "
                      "--kidnap this puts the depth-sanity closure gate "
                      "under maximum pressure (round-4 verdict item 6c). "
                      "Gates additionally require ZERO false applied "
                      "closures (applied pairs must be truly co-located)")
  p.add_argument("--blackout_windows", default="",
                 help="internal (generate subprocess): comma-separated "
                      "start:end frame windows rendered as black frames")
  p.add_argument("--per_frame_drain", action="store_true",
                 help="drain the device queue after every frame so per-frame"
                      " times cover device execution (latency protocol; "
                      "throughput numbers from such a run are not "
                      "comparable)")
  p.add_argument("--cell_size", type=int, default=4,
                 help="surfel sparsification cell (reference default 4 = "
                      "1/16 of pixels; 1-2 for the >=1M-live-surfel scale "
                      "protocol)")
  p.add_argument("--surfel_capacity_log", type=int, default=None,
                 help="log2 surfel-store capacity override (default: 2^17 "
                      "pipelined / 2^16 host growth start)")
  p.add_argument("--radius", type=float, default=None,
                 help="orbit radius in meters (default 0.25; "
                      "drift/kidnap modes 2.0)")
  p.add_argument("--loops", type=float, default=None,
                 help="number of orbits (default 2.0; drift/kidnap 1.15)")
  p.add_argument("--out", default=None)
  p.add_argument("--generate_only", action="store_true",
                 help="internal: render the dataset and exit (run in a "
                      "subprocess so renderer readbacks don't de-pipeline "
                      "the measuring process)")
  args = p.parse_args()
  biased = args.drift > 0 or args.kidnap > 0
  if args.radius is None:
    args.radius = 2.0 if biased else 0.25
  if args.loops is None:
    # Double-kidnap needs a revisit AFTER EACH blackout for its two
    # closures: 1.6 loops puts the second kidnap (at 75%) inside the
    # revisit arc (measured: at 1.15 loops the single end-revisit yields
    # exactly one closure — the weak-edge pose graph still distributed the
    # correction across both blackout edges to 20% ATE, but the map kept
    # the first kidnap's orphaned surfels).
    args.loops = (1.6 if args.double_kidnap else 1.15) if biased else 2.0
  if biased and args.dataset == p.get_default("dataset"):
    args.dataset += "_excursion"
  if (args.occlusions and args.dataset.startswith("/tmp/badslam_long_seq")
      and not args.dataset.endswith("_occl")):  # idempotent: the generate
    args.dataset += "_occl"                     # subprocess re-parses args
  if args.dataset.startswith("/tmp/badslam_long_seq"):
    if args.image_blackout and not args.dataset.endswith("_imgblk"):
      args.dataset += "_imgblk"
    if args.double_kidnap and not args.dataset.endswith("_dbl"):
      args.dataset += "_dbl"
    if args.alias_period > 0 and "_alias" not in args.dataset:
      args.dataset += f"_alias{args.alias_period:g}"

  if args.generate_only:
    windows = [tuple(int(v) for v in wd.split(":"))
               for wd in args.blackout_windows.split(",") if wd]
    ensure_dataset(args.dataset, args.frames, args.size, noise=args.noise,
                   radius=args.radius, loops=args.loops,
                   occlusions=args.occlusions,
                   texture_period=args.alias_period or None,
                   blackout_windows=windows or None)
    return 0

  from badslam_tpu.config import BadSlamConfig
  from badslam_tpu.eval import ate_rmse
  from badslam_tpu.io import dataset as dataset_io
  from badslam_tpu.slam.system import BadSlam
  from badslam_tpu.utils.compile_cache import enable_compile_cache
  enable_compile_cache(os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), ".jax_cache"))

  # Kidnap windows (computed BEFORE generation: --image_blackout renders
  # them into the dataset). A sensor blackout at 45% of the run (deep in
  # the excursion, no covisibility with the start) long enough that the
  # unobserved motion exceeds the association band; --double_kidnap uses
  # two windows at 35% and 65% instead.
  blackout_frames = 0
  kidnap_windows = []
  if args.kidnap > 0:
    arc_speed = (2.0 * np.pi * args.radius * args.loops
                 / args.frames)  # m per frame
    blackout_frames = max(2, int(round(args.kidnap / arc_speed)))
    # Double mode: kidnap 1 in novel terrain (repaired at the first
    # revisit), kidnap 2 inside the revisit arc (repaired by re-anchoring
    # against the pass-1 map) — each gets a closure, and the second pose
    # graph must re-add the first's accumulated loop edge.
    starts = ([int(0.35 * args.frames), int(0.75 * args.frames)]
              if args.double_kidnap else [int(0.45 * args.frames)])
    kidnap_windows = [(s, s + blackout_frames) for s in starts]

  # Render the dataset in a SUBPROCESS: the renderer is jax code whose
  # readbacks would permanently drop THIS process's tunnel dispatch into
  # sync mode before the measured run even starts (PERF.md "tunnel dispatch
  # modes"). A cached dataset is detected without touching the device.
  import subprocess
  gen = subprocess.run(
      [sys.executable, __file__, "--generate_only",
       "--dataset", args.dataset, "--frames", str(args.frames),
       "--size", args.size, "--radius", str(args.radius),
       "--loops", str(args.loops),
       "--alias_period", str(args.alias_period)]
      + (["--noise"] if args.noise else [])
      + (["--occlusions"] if args.occlusions else [])
      + (["--blackout_windows",
          ",".join(f"{s}:{e}" for s, e in kidnap_windows)]
         if args.image_blackout and kidnap_windows else []),
      cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
  if gen.returncode != 0:
    raise RuntimeError("dataset generation failed")
  video = dataset_io.load_tum_dataset(args.dataset, None)
  video.enable_native_prefetch()
  n = min(args.frames, video.frame_count())

  cfg = BadSlamConfig(
      keyframe_interval=args.keyframe_interval,
      max_depth=5.0,
      parallel_ba=not args.sequential and not args.pipelined,
      parallel_loop_detection=not args.sequential and not args.pipelined,
      enable_loop_detection=True,
      pipelined_frontend=args.pipelined,
      pipelined_concurrent_ba=args.pipelined and args.concurrent_ba,
      # Pipelined runs pre-size both stores and CAP the surfel store: the
      # dense BA phases cost O(capacity), the transfer-free growth bound
      # over-estimates (it ratchets by one creation pass's headroom), and
      # every capacity doubling recompiles the BA programs mid-run. 2^17 is
      # ~2.8x the measured 500-frame map (46.9k surfels, round 2); at the
      # cap, creation behaves like the reference at max_surfel_count.
      sparse_surfel_cell_size=args.cell_size,
      initial_surfel_capacity=(
          (1 << args.surfel_capacity_log) if args.surfel_capacity_log
          else (1 << 17) if args.pipelined else (1 << 16)),
      max_surfel_count=(
          (1 << args.surfel_capacity_log) if args.surfel_capacity_log
          else (1 << 17) if args.pipelined else 25_000_000),
      initial_keyframe_capacity=64 if args.pipelined else 16,
  )
  slam_cls = BadSlam
  kidnap_at = kidnap_windows[0][0] if kidnap_windows else int(0.45 * n)
  if args.kidnap > 0 and not args.image_blackout:
    # Classic protocol: inject the blackout through the force_fail seam and
    # suppress in-window keyframes. --image_blackout instead bakes black
    # frames into the dataset and runs the UNMODIFIED system.
    slam_cls = make_kidnapped_slam(BadSlam, kidnap_windows)
  elif args.drift > 0:
    slam_cls = make_biased_slam(BadSlam, lambda i: args.drift)
  slam = slam_cls(cfg, video)
  import jax
  report = {"frames": n, "parallel": not args.sequential,
            "noise": args.noise,
            "size": args.size,
            "backend": jax.default_backend(),
            "cell_size": args.cell_size,
            "pipelined": args.pipelined,
            "concurrent_ba": bool(args.pipelined and args.concurrent_ba)}
  if args.prewarm:
    # Production startup mode: compile every program shape of the expected
    # map size before the frame loop — the measured run then has no
    # mid-run compile spikes (reported separately as prewarm_s).
    t_warm = time.perf_counter()
    slam.prewarm(max_ba_keyframes=n // max(1, args.keyframe_interval) + 1)
    report["prewarm_s"] = round(time.perf_counter() - t_warm, 1)
    report["prewarm_breakdown"] = getattr(slam, "last_prewarm_breakdown",
                                          None)
    print(f"prewarm: {report['prewarm_s']} s", flush=True)
  report["trajectory"] = {"radius_m": args.radius, "loops": args.loops}
  if args.drift > 0:
    report["drift_m_per_frame"] = args.drift
    report["uncorrected_endpoint_drift_m"] = round(args.drift * n, 4)
  if args.kidnap > 0:
    report["kidnap_m_requested"] = args.kidnap
    report["kidnap_at_frame"] = kidnap_at
    report["blackout_frames"] = blackout_frames
    report["blackout_windows"] = [list(wd) for wd in kidnap_windows]
    report["image_blackout"] = bool(args.image_blackout)
  if args.alias_period > 0:
    report["alias_period_m"] = args.alias_period

  def drain():
    """Wait for all queued device work (no host transfer). In concurrent-BA
    mode the BA thread dispatches into its own program order, so waiting on
    the tracking stream's traj_rel alone would NOT cover BA execution —
    block on the BA-side state too (still transfer-free)."""
    if args.pipelined:
      import jax
      jax.block_until_ready(slam._pl.traj_rel)
      if args.concurrent_ba:
        jax.block_until_ready(slam.direct_ba.kf.global_T_frame)

  # Steady-state measurement: drain the device queue every 50 frames and
  # take the MEDIAN span cost over the second half of the run — robust to
  # the one-time jit-compile spikes that land whenever a store shape or a
  # new program (e.g. the device-closure verifier) first appears; the axon
  # backend has no persistent compile cache, so cumulative FPS mixes those
  # in (see PERF.md).
  #
  # PER-FRAME times are recorded for every frame (host wall time around
  # process_frame). Without --per_frame_drain they measure the frame's HOST
  # cost — dispatch plus everything host-side (BoW retrain, RANSAC, compile
  # spikes), which is exactly where tail spikes live; device execution
  # overlaps across frames (async dispatch). With --per_frame_drain the
  # device queue is drained every frame, so each sample covers the frame's
  # device execution too (the cudaEvent-accurate protocol,
  # bad_slam.cc:411-447) — at the cost of serializing dispatch against
  # execution, so throughput numbers from such a run are NOT comparable.
  span = 50
  span_seconds = []
  frame_seconds = np.zeros(n, np.float64)
  t_span = time.perf_counter()
  t0 = t_span
  for i in range(n):
    t_frame = time.perf_counter()
    slam.process_frame(i)
    if args.per_frame_drain:
      drain()
    frame_seconds[i] = time.perf_counter() - t_frame
    video.frames[i].clear_cache()
    if (i + 1) % span == 0:
      drain()
      now = time.perf_counter()
      span_seconds.append(now - t_span)
      t_span = now
    if (i + 1) % 100 == 0:
      # surfel_count is a device read — keep the pipelined loop transfer-free.
      surfels = "n/a" if args.pipelined else slam.direct_ba.surfel_count
      print(f"frame {i + 1}/{n}: {(i + 1) / (time.perf_counter() - t0):.2f} "
            f"FPS, {slam.direct_ba.keyframe_count} keyframes, "
            f"{surfels} surfels", flush=True)
  drain()
  if len(span_seconds) >= 2:
    tail = span_seconds[len(span_seconds) // 2:]
    report["steady_state_fps"] = round(span / float(np.median(tail)), 2)
    report["span_s"] = [round(s, 2) for s in span_seconds]
  # Per-frame tail latency (p50/p95/p99/max, milliseconds). The second half
  # of the run is also reported separately: steady state, past the one-time
  # compile spikes (which --prewarm removes).
  def _percentiles(samples):
    return {"p50_ms": round(float(np.percentile(samples, 50)) * 1e3, 3),
            "p95_ms": round(float(np.percentile(samples, 95)) * 1e3, 3),
            "p99_ms": round(float(np.percentile(samples, 99)) * 1e3, 3),
            "max_ms": round(float(samples.max()) * 1e3, 3)}
  report["per_frame"] = dict(
      _percentiles(frame_seconds), drained=bool(args.per_frame_drain))
  report["per_frame_steady"] = _percentiles(frame_seconds[n // 2:])
  # Tail-latency gate (round-4 verdict item 6/weak): clean pipelined runs
  # must keep the steady-state per-frame p99 inside the reference's 30 FPS
  # real-time frame budget (bad_slam.cc:449-479 pacing intent) — measured
  # headline is ~19 ms, so a regression that doubles the tail fails loudly
  # instead of hiding behind a passing ATE. Fault-injection runs are
  # exempt: their p99 IS the closure + repair burst, by design.
  if args.pipelined and args.kidnap == 0 and args.drift == 0:
    budget_ms = 1000.0 / 30.0
    report["latency_budget_ms"] = round(budget_ms, 1)
    report["latency_pass"] = bool(
        report["per_frame_steady"]["p99_ms"] <= budget_ms)
  loop_elapsed = time.perf_counter() - t0
  report["fps"] = round(n / loop_elapsed, 2)
  # Partial report BEFORE finalize: on the axon tunnel the
  # speculation->sync transition of very long runs can wedge indefinitely
  # (observed at 2000 frames), and the loop-side evidence must survive.
  if args.out:
    with open(args.out + ".partial", "w") as f:
      json.dump(report, f, indent=2)
  t_fin = time.perf_counter()
  if args.pipelined:
    # The run's first device->host transfers happen here, after timing.
    print("finalizing (BA drain + device-event resolution + trajectory "
          "readback)...", flush=True)
    slam.finalize_pipelined()
  print(f"finalize: {time.perf_counter() - t_fin:.1f} s; stopping threads...",
        flush=True)
  slam.stop_ba_thread_and_wait()
  if slam.loop_detector is not None:
    slam.loop_detector.request_exit_and_wait()
  # Post-loop cost (BA-queue drain, device-closure resolution readbacks,
  # trajectory materialization, thread shutdown) — reported separately so
  # the frame-loop fps is not diluted by one-time finalization.
  report["finalize_s"] = round(time.perf_counter() - t_fin, 2)
  report["keyframes"] = slam.direct_ba.keyframe_count
  report["surfels"] = slam.direct_ba.surfel_count

  # --- trajectory accuracy ---
  ts, poses = slam.trajectory()
  est = np.stack([T[:3, 3] for T in poses])
  gt_raw = {}
  for line in open(os.path.join(args.dataset, "groundtruth.txt")):
    v = line.split()
    gt_raw[round(float(v[0]), 4)] = np.array(
        [float(v[1]), float(v[2]), float(v[3])])
  gt = np.stack([gt_raw[round(t, 4)] for t in ts])
  rmse, _ = ate_rmse(est, gt)
  report["ate_rmse_m"] = rmse

  # --- map quality (surfels vs the analytic ground-truth surface) ---
  # The map lives in the SLAM gauge (first keyframe at identity); bring it
  # into the world frame with the SAME rigid alignment the ATE uses, then
  # measure each surfel's distance to the closed-form heightmap surface
  # (synthetic.surfel_map_error). This checks the MAP converged onto the
  # observed geometry — a pose-graph repair that never re-optimized the
  # surfels, or a geometry-GN regression, shows up here and not in ATE.
  from badslam_tpu.loop.ransac import umeyama_alignment
  from badslam_tpu.utils import synthetic
  if args.kidnap > 0:
    # Kidnap mode: align the MAP on the (repaired) KEYFRAME poses, not the
    # full frame trajectory — the held-pose blackout frames carry an
    # unavoidable residual that would bias the rigid fit and read as map
    # error; what the map gate must measure is whether the surfels
    # re-converged onto the corrected keyframes (round-3 verdict item 5).
    # Under --image_blackout, keyframes CREATED inside a blackout window
    # (black frames at held poses, zero surfels) carry the same
    # irreducible residual — exclude them from the fit too.
    kf_fi = np.asarray(slam.keyframe_frame_indices)
    kf_valid = np.asarray(slam.direct_ba.kf.valid)[: len(kf_fi)]
    if args.image_blackout:
      in_blackout = np.asarray(
          [any(s <= fi < e for (s, e) in kidnap_windows) for fi in kf_fi])
      kf_valid = kf_valid & ~in_blackout
    kf_est = np.asarray(
        slam.direct_ba.kf.global_T_frame)[: len(kf_fi), :3, 3][kf_valid]
    kf_gt = gt[kf_fi[kf_valid]]
    T_align = umeyama_alignment(kf_est, kf_gt)
  else:
    T_align = umeyama_alignment(est, gt)
  valid_s = np.asarray(slam.direct_ba.surfels.valid)
  spos = np.asarray(slam.direct_ba.surfels.pos)[valid_s]
  boxes = synthetic.occlusion_boxes(5) if args.occlusions else None
  spos_world = spos @ T_align[:3, :3].T + T_align[:3, 3]
  map_err = synthetic.surfel_map_error(spos_world, boxes=boxes)
  # Outlier accounting (the occlusion world's reason to exist): how many
  # surfels the min-observation / free-space-violation delete pass removed
  # over the run (host modes only; the count is a device read), and how
  # many SURVIVING surfels still sit > 2 cm off every true surface.
  report["surfels_deleted_by_filtering"] = (
      None if args.pipelined else slam.direct_ba.num_surfels_deleted)
  if map_err.get("count"):
    gt_z = synthetic.heightmap_z(spos_world[:, 0], spos_world[:, 1])
    err_v = np.abs(spos_world[:, 2] - gt_z)
    if boxes is not None:
      abs_box = np.full(len(spos_world), np.inf)
      for bmin, bmax in boxes:
        q = np.maximum(np.maximum(bmin[None] - spos_world,
                                  spos_world - bmax[None]), 0.0)
        abs_box = np.minimum(abs_box, np.linalg.norm(q, axis=1))
      err_v = np.minimum(err_v, abs_box)
    report["surviving_outlier_surfels_gt_2cm"] = int((err_v > 0.02).sum())
  report["map_error"] = {k: (round(v, 7) if isinstance(v, float) else v)
                         for k, v in map_err.items()}
  if args.kidnap > 0:
    # Kidnap mode: the MEDIAN map gate still applies (the pose-graph repair
    # + post-closure BA must re-converge the bulk of the map onto the
    # corrected poses); surfels created DURING the blackout sit at held
    # poses and are a bounded minority, which the median tolerates.
    bound = 2.0 * (5e-3 if args.noise else 2e-3)
    report["map_pass"] = bool(map_err.get("median_abs_m", 1.0) < bound)
  else:
    # Measured: median 0.21 mm at 160x120 (test_map_quality.py), tighter at
    # 640x480; sensor noise (sigma 1.2-1.9 mm) raises the floor.
    bound = 5e-3 if args.noise else 2e-3
    report["map_pass"] = bool(map_err.get("median_abs_m", 1.0) < bound)
  if args.kidnap > 0:
    # Actual unobserved offset per window: the GT displacement over the
    # blackout (the held pose misses exactly this motion). The pose
    # re-anchors at the first usable keyframe AFTER each blackout; the
    # unobserved motion spans up to there.
    gt_ts = sorted(gt_raw.keys())
    interval = max(1, args.keyframe_interval)
    excl = np.ones(len(est), bool)
    offsets = []
    for (w_start, w_end) in kidnap_windows:
      recovery = w_end + ((-w_end) % interval)
      p_start = gt_raw[gt_ts[min(w_start, len(gt_ts) - 1)]]
      p_end = gt_raw[gt_ts[min(recovery, len(gt_ts) - 1)]]
      offsets.append(float(np.linalg.norm(p_end - p_start)))
      # Exclude each blackout window from the ATE: frames with NO usable
      # sensor data hold the last pose by construction — their error
      # (ramping 0 -> offset) is irreducible for any system and would
      # otherwise consume most of the gate's budget (~0.11 m of RMSE at
      # 500 frames for a 0.72 m offset).
      excl[w_start:min(recovery, len(est))] = False
    offset = float(sum(offsets))
    report["kidnap_offset_m"] = round(offset, 4)
    if len(offsets) > 1:
      report["kidnap_offsets_m"] = [round(o, 4) for o in offsets]
    rmse_excl, _ = ate_rmse(est[excl], gt[excl])
    report["ate_rmse_excl_blackout_m"] = rmse_excl
    # The weak-edge pose graph (odometry edges formed while the gate fired
    # carry WEAK_EDGE_WEIGHT) localizes the correction at the blackout
    # instead of spreading it along the chain, so the repair must remove at
    # least 75% of the (total) offset over the OBSERVED frames (round-3
    # verdict item 5; old gate was 50% of the full trajectory).
    report["ate_pass"] = bool(rmse_excl < 0.25 * offset)
  elif args.drift > 0:
    # Drift mode: verifies ABSORPTION — per-keyframe frame-to-model BA
    # re-snaps smooth drift against the covisible local map, so the final
    # ATE must stay far below the uncorrected endpoint (measured: 0.13 mm
    # vs 0.1 m uncorrected), with every loop candidate correctly ignored.
    report["ate_pass"] = bool(rmse < 0.05 * args.drift * n)
  else:
    # Bound: interpolation-bias drift (~0.02 mm/frame at 640x480) is
    # partially absorbed by BA + loop closure; 2 mm leaves ~4x margin over
    # measured runs while still flagging any divergence-class regression.
    report["ate_pass"] = bool(rmse < 2e-3)

  # --- loop-closure bookkeeping ---
  det = slam.loop_detector
  if det is not None:
    report["loop_events"] = len(det.events)
    report["loops_closed"] = det.num_loops_closed
    report["loops_ignored"] = det.num_loops_ignored
    report["vocab_trained"] = det.vocab is not None
    report["counters_consistent"] = (
        det.num_loops_closed + det.num_loops_ignored == len(det.events))

  # --- threading / store invariants ---
  valid = np.asarray(slam.direct_ba.kf.valid)
  invariants = {
      "poses_finite": bool(np.isfinite(est).all()),
      "kf_poses_finite": bool(np.isfinite(
          np.asarray(slam.direct_ba.kf.global_T_frame)[valid]).all()),
      "no_orphaned_detector_entries": (det is None or all(
          e is None or (0 <= e.kf_slot < len(valid) and valid[e.kf_slot])
          for e in det.entries)),
      "ba_thread_stopped": slam._ba_thread is None or
          not slam._ba_thread.is_alive(),
      "queue_drained": len(slam._queued_keyframes) == 0,
  }
  report["invariants"] = invariants
  # The loop-detection path must actually have been EXERCISED (events may
  # all be rejected as "BA will absorb it" on drift-free synthetic data, but
  # zero events means the gate silently lost coverage).
  loop_exercised = det is None or len(det.events) > 0
  report["loop_path_exercised"] = bool(loop_exercised)
  # Kidnap mode additionally requires that at least one closure per
  # blackout window was APPLIED (not just detected-and-ignored): the
  # baked-in offset makes the is-BA-enough test fail, so a shortfall here
  # means the repair path is broken. --double_kidnap thereby exercises the
  # accumulated loop-edge buffer: the second pose graph must re-add the
  # first window's applied edge.
  closure_ok = (args.kidnap == 0 or det is None
                or det.num_loops_closed >= max(1, len(kidnap_windows)))
  # False-closure accounting (aliasing protocol): an APPLIED closure is
  # false iff its measured CONSTRAINT is wrong — the |t| of the averaged
  # relative pose is the measured camera-center distance of the pair, and
  # must agree with the GT pair distance. (Pair proximity alone cannot
  # distinguish a correct wide-baseline closure — keyframe arc spacing here
  # is ~0.3 m — from an aliased match claiming two tiles >= alias_period
  # apart are the same place.) Tolerance: 0.15 m + 10%, generous vs the
  # 0.06 m RANSAC inlier threshold and far below the 0.8 m tile period.
  if det is not None:
    kf_fi = slam.keyframe_frame_indices
    false_applied = 0
    for e in det.events:
      if not e.applied or e.measured_t_norm is None:
        continue
      try:
        d_gt = float(np.linalg.norm(gt[kf_fi[e.current_slot]]
                                    - gt[kf_fi[e.matched_slot]]))
      except (IndexError, KeyError):
        continue
      if abs(e.measured_t_norm - d_gt) > 0.15 + 0.1 * d_gt:
        false_applied += 1
    report["false_applied_closures"] = false_applied
    if args.alias_period > 0:
      closure_ok = closure_ok and false_applied == 0
  report["pass"] = bool(report["ate_pass"] and report["map_pass"]
                        and all(invariants.values())
                        and report.get("counters_consistent", True)
                        and loop_exercised and closure_ok
                        and report.get("latency_pass", True))
  print(json.dumps(report, indent=2), flush=True)
  if args.out:
    with open(args.out, "w") as f:
      json.dump(report, f, indent=2)
  return 0 if report["pass"] else 1


if __name__ == "__main__":
  sys.exit(main())
