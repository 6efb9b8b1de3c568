"""ctypes bridge to the native data loader (native/dataloader.cc).

Replaces the reference's native data path — libvis libpng image I/O plus the
PreLoadThread disk prefetcher (pre_load_thread.{h,cc}) — with a C++ thread
pool that decodes PNG frames ahead of the SLAM cursor. Falls back to
PIL-based loading transparently when the shared library is not built
(`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native", "libbadslam_native.so"),
    "libbadslam_native.so",
]


def _load_library() -> Optional[ctypes.CDLL]:
  for path in _LIB_PATHS:
    try:
      lib = ctypes.CDLL(path)
    except OSError:
      continue
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int]
    lib.loader_get.restype = ctypes.c_int
    lib.loader_get.argtypes = [
        ctypes.c_void_p, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_long, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_void_p, ctypes.c_long, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.decode_png.restype = ctypes.c_int
    lib.decode_png.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int)]
    return lib
  return None


_lib = None
_lib_checked = False


def get_library() -> Optional[ctypes.CDLL]:
  global _lib, _lib_checked
  if not _lib_checked:
    _lib = _load_library()
    _lib_checked = True
  return _lib


def native_available() -> bool:
  return get_library() is not None


def decode_png(path: str) -> np.ndarray:
  """One-shot native PNG decode -> numpy array (u8 HxW[,C] or u16 HxW)."""
  lib = get_library()
  if lib is None:
    raise RuntimeError("native library not built (make -C native)")
  h = ctypes.c_int()
  w = ctypes.c_int()
  ch = ctypes.c_int()
  bd = ctypes.c_int()
  # First pass: query dimensions (no output buffer).
  rc = lib.decode_png(path.encode(), None, ctypes.byref(h), ctypes.byref(w),
                      ctypes.byref(ch), ctypes.byref(bd))
  if rc != 0:
    raise IOError(f"failed to decode {path}")
  dtype = np.uint16 if bd.value == 16 else np.uint8
  shape = ((h.value, w.value) if ch.value == 1
           else (h.value, w.value, ch.value))
  out = np.empty(shape, dtype)
  rc = lib.decode_png(path.encode(), out.ctypes.data_as(ctypes.c_void_p),
                      ctypes.byref(h), ctypes.byref(w), ctypes.byref(ch),
                      ctypes.byref(bd))
  if rc != 0:
    raise IOError(f"failed to decode {path}")
  return out


class NativePrefetchLoader:
  """Prefetching RGB-D frame loader over the native thread pool.

  get(i) returns (depth_u16 (H,W), rgb_u8 (H,W,3)) and keeps `prefetch`
  frames of lookahead decoding in the background.
  """

  def __init__(self, depth_paths: List[str], rgb_paths: List[str],
               prefetch: int = 4, threads: int = 2):
    lib = get_library()
    if lib is None:
      raise RuntimeError("native library not built (make -C native)")
    assert len(depth_paths) == len(rgb_paths)
    self._lib = lib
    self._n = len(depth_paths)
    # Probe dimensions from the first frame.
    d0 = decode_png(depth_paths[0])
    c0 = decode_png(rgb_paths[0])
    if d0.dtype != np.uint16 or d0.ndim != 2:
      raise ValueError("depth PNGs must be 16-bit grayscale")
    self.depth_shape = d0.shape
    self.rgb_shape = (c0.shape[0], c0.shape[1],
                      c0.shape[2] if c0.ndim == 3 else 1)

    self._depth_arr = (ctypes.c_char_p * self._n)(
        *[p.encode() for p in depth_paths])
    self._rgb_arr = (ctypes.c_char_p * self._n)(
        *[p.encode() for p in rgb_paths])
    self._handle = lib.loader_create(self._n, self._depth_arr, self._rgb_arr,
                                     prefetch, threads)

  def get(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
    if not (0 <= index < self._n):
      raise IndexError(index)
    depth = np.empty(self.depth_shape, np.uint16)
    rgb = np.empty(self.rgb_shape, np.uint8)
    dh = ctypes.c_int()
    dw = ctypes.c_int()
    ch = ctypes.c_int()
    cw = ctypes.c_int()
    rc = self._lib.loader_get(
        self._handle, index,
        depth.ctypes.data_as(ctypes.c_void_p), depth.nbytes,
        ctypes.byref(dh), ctypes.byref(dw),
        rgb.ctypes.data_as(ctypes.c_void_p), rgb.nbytes,
        ctypes.byref(ch), ctypes.byref(cw))
    if rc == 2:
      raise IOError(
          f"frame {index}: decoded size/format differs from frame 0 "
          f"(got {dh.value}x{dw.value} depth / {ch.value}x{cw.value} rgb)")
    if rc != 0:
      raise IOError(f"failed to load frame {index}")
    if (dh.value, dw.value) != self.depth_shape:
      raise ValueError(f"frame {index}: depth size changed")
    if rgb.shape[-1] == 1:
      rgb = np.repeat(rgb, 3, axis=-1)
    return depth, rgb[..., :3]

  def close(self):
    if self._handle is not None:
      self._lib.loader_destroy(self._handle)
      self._handle = None

  def __del__(self):
    try:
      self.close()
    except Exception:
      pass
