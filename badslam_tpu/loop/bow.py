"""Hierarchical binary bag-of-words vocabulary for loop-closure retrieval.

The reference ships DBoW2 + a pre-trained BRIEF vocabulary (k=10, L=6;
loop_detector.cc:150-179 with resources/brief_k10L6.voc). We do not ship a
binary resource; instead the vocabulary is trained ONLINE from the map's own
ORB descriptors once enough keyframes exist — hierarchical k-medians over
binary descriptors (bitwise majority vote = the Hamming-metric centroid),
exactly DBoW2's construction (Galvez-Lopez & Tardos, TRO 2012), minus the
offline corpus.

Scoring follows DBoW2's L1 norm: s(v, w) = 1 - 0.5 * ||v/|v|_1 - w/|w|_1||_1
with TF-IDF-weighted word histograms, and the detector normalizes query
scores by the score against the temporally-previous keyframe (DLoopDetector's
normalized similarity score), keeping the reference's alpha = 0.15 gate.

Everything here is plain numpy on the CPU — retrieval sits on the loop-
detection thread, off the TPU hot path, mirroring the reference's layering.
"""

from __future__ import annotations

import ctypes
from typing import List, Optional

import numpy as np

_POPCOUNT_LUT = np.unpackbits(
    np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)

_native_checked = False
_native_lib = None


def native_vocab_lib() -> Optional[ctypes.CDLL]:
  """The native BoW backend (native/bow.cc), or None when not built.
  Construction semantics match the numpy path (leaf/empty-cluster/tie
  rules); trees differ bit-wise because the RNG streams differ."""
  global _native_checked, _native_lib
  if _native_checked:
    return _native_lib
  _native_checked = True
  from badslam_tpu.io import native_loader
  lib = native_loader.get_library()
  if lib is None or not hasattr(lib, "bow_fit"):
    return None
  lib.bow_fit.restype = ctypes.c_void_p
  lib.bow_fit.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
                          ctypes.c_int, ctypes.c_int, ctypes.c_uint64]
  lib.bow_num_words.restype = ctypes.c_int
  lib.bow_num_words.argtypes = [ctypes.c_void_p]
  lib.bow_transform.restype = ctypes.c_int
  lib.bow_transform.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
  lib.bow_free.argtypes = [ctypes.c_void_p]
  _native_lib = lib
  return _native_lib


def hamming_to_centers(bits: np.ndarray, centers: np.ndarray) -> np.ndarray:
  """(N, B) unpacked bits vs (K, B) unpacked centers -> (N, K) distances."""
  # XOR-free: Hamming = sum(bits != center) = B - bits@c - (1-bits)@(1-c).
  b = bits.astype(np.float32)
  c = centers.astype(np.float32)
  agree = b @ c.T + (1.0 - b) @ (1.0 - c.T)
  return bits.shape[1] - agree


def _kmedians(bits: np.ndarray, k: int, rng: np.random.Generator,
              iters: int = 8) -> np.ndarray:
  """Binary k-medians: majority-vote centroids under Hamming distance.
  Returns (k', B) centers (k' <= k when there are few distinct points)."""
  n = bits.shape[0]
  if n <= k:
    return np.unique(bits, axis=0)
  centers = bits[rng.choice(n, size=k, replace=False)].copy()
  for _ in range(iters):
    d = hamming_to_centers(bits, centers)
    assign = d.argmin(axis=1)
    new_centers = []
    for j in range(len(centers)):
      members = bits[assign == j]
      if len(members) == 0:
        # Re-seed an empty cluster on the farthest point.
        new_centers.append(bits[d.min(axis=1).argmax()])
      else:
        new_centers.append((members.mean(axis=0) >= 0.5).astype(np.uint8))
    new_centers = np.stack(new_centers)
    if np.array_equal(new_centers, centers):
      break
    centers = new_centers
  return centers


class BinaryVocabulary:
  """Hierarchical k-medians tree over binary descriptors.

  Nodes are stored flat: node i has centers ``self.centers[i]`` (K_i, B) and
  children ``self.children[i]`` (list of node ids or leaf word ids as
  negative numbers -(word+1)).
  """

  def __init__(self, branching: int = 10, depth: int = 3, seed: int = 0,
               backend: str = "auto"):
    """backend: 'auto' (native/bow.cc when built, else numpy), 'native',
    or 'numpy'."""
    self.branching = branching
    self.depth = depth
    self.seed = seed
    self.centers: List[np.ndarray] = []
    self.children: List[List[int]] = []
    self.num_words = 0
    self.idf: Optional[np.ndarray] = None
    if backend not in ("auto", "native", "numpy"):
      raise ValueError(f"unknown BoW backend {backend!r}")
    self.backend = backend
    self._handle = None
    self._desc_bytes = 0

  def __del__(self):
    try:
      self._free_native()
    except Exception:
      pass

  def _free_native(self):
    if self._handle is not None:
      native_vocab_lib().bow_free(self._handle)
      self._handle = None

  def fit(self, descriptors: np.ndarray) -> "BinaryVocabulary":
    """descriptors: (N, 32) uint8 packed."""
    lib = native_vocab_lib() if self.backend in ("auto", "native") else None
    if self.backend == "native" and lib is None:
      raise RuntimeError("native BoW backend not built (make -C native)")
    self._free_native()
    if lib is not None:
      desc = np.ascontiguousarray(descriptors, np.uint8)
      if desc.ndim != 2:
        desc = desc.reshape(len(desc), -1)
      self._desc_bytes = desc.shape[1] if desc.size else 32
      self._handle = lib.bow_fit(
          desc.ctypes.data_as(ctypes.c_void_p), len(desc), self._desc_bytes,
          self.branching, self.depth, self.seed)
      if self._handle is None:
        raise RuntimeError("bow_fit failed")
      self.num_words = lib.bow_num_words(self._handle)
      return self
    rng = np.random.default_rng(self.seed)
    bits = np.unpackbits(descriptors, axis=1)
    self.centers, self.children = [], []
    self.num_words = 0
    self._build(bits, self.depth, rng)
    return self

  def _build(self, bits: np.ndarray, depth: int,
             rng: np.random.Generator) -> int:
    """Returns the node id (>= 0) or leaf word encoding (< 0)."""
    if depth == 0 or len(bits) <= self.branching:
      word = self.num_words
      self.num_words += 1
      return -(word + 1)
    centers = _kmedians(bits, self.branching, rng)
    node = len(self.centers)
    self.centers.append(centers)
    self.children.append([])
    assign = hamming_to_centers(bits, centers).argmin(axis=1)
    kids = []
    for j in range(len(centers)):
      members = bits[assign == j]
      if len(members) == 0:
        word = self.num_words
        self.num_words += 1
        kids.append(-(word + 1))
      else:
        kids.append(self._build(members, depth - 1, rng))
    self.children[node] = kids
    return node

  def transform(self, descriptors: np.ndarray) -> np.ndarray:
    """(N, 32) packed -> (N,) word ids."""
    if len(descriptors) == 0:
      return np.zeros((0,), np.int32)
    if self._handle is not None:
      lib = native_vocab_lib()
      desc = np.ascontiguousarray(descriptors, np.uint8)
      if desc.ndim != 2:
        desc = desc.reshape(len(desc), -1)
      out = np.empty((len(desc),), np.int32)
      rc = lib.bow_transform(
          self._handle, desc.ctypes.data_as(ctypes.c_void_p), len(desc),
          desc.shape[1], out.ctypes.data_as(ctypes.c_void_p))
      if rc != 0:
        raise ValueError(
            f"descriptor length {desc.shape[1]} != vocabulary's "
            f"{self._desc_bytes}")
      return out
    bits = np.unpackbits(descriptors, axis=1)
    out = np.zeros(len(bits), np.int32)
    # Iterative descent, processed in groups per node (vectorized within).
    stack = [(0 if self.centers else -1, np.arange(len(bits)))]
    if not self.centers:  # degenerate single-word vocabulary
      return out
    while stack:
      node, idx = stack.pop()
      centers = self.centers[node]
      assign = hamming_to_centers(bits[idx], centers).argmin(axis=1)
      for j, child in enumerate(self.children[node]):
        sel = idx[assign == j]
        if len(sel) == 0:
          continue
        if child < 0:
          out[sel] = -(child + 1)
        else:
          stack.append((child, sel))
    return out

  def fit_idf(self, word_lists: List[np.ndarray]):
    """Inverse document frequency from the database's word sets."""
    df = np.zeros(self.num_words, np.float64)
    for words in word_lists:
      df[np.unique(words)] += 1.0
    n = max(1, len(word_lists))
    self.idf = np.log(n / np.maximum(df, 1.0)).astype(np.float32) + 1e-3

  def bow_vector(self, words: np.ndarray) -> np.ndarray:
    """L1-normalized TF-IDF histogram (W,) float32."""
    v = np.bincount(words, minlength=self.num_words).astype(np.float32)
    if self.idf is not None:
      v = v * self.idf
    s = v.sum()
    return v / s if s > 0 else v


def l1_score(v: np.ndarray, db: np.ndarray) -> np.ndarray:
  """DBoW2 L1 similarity of query v (W,) against db rows (D, W): both
  L1-normalized; s = 1 - 0.5*|v - w|_1 in [0, 1]."""
  return 1.0 - 0.5 * np.abs(db - v[None, :]).sum(axis=1)


class InvertedIndex:
  """DBoW2's inverted file: word -> postings of (entry id, tf-idf weight).

  For L1-normalized nonnegative vectors the L1 similarity reduces to
  s(v, w) = 1 - 0.5*|v - w|_1 = sum_i min(v_i, w_i), which only receives
  contributions from SHARED words — so a query touches exactly the postings
  of its own words instead of every database row (DBoW2
  TemplatedDatabase::queryL1). Entries are append-only with tombstones,
  mirroring the detector's slot semantics.
  """

  def __init__(self, num_words: int):
    self.num_words = num_words
    self._postings: List[List] = [[] for _ in range(num_words)]
    self._alive: List[bool] = []

  def add(self, bow: Optional[np.ndarray]) -> int:
    """Insert an L1-normalized TF-IDF vector; returns its entry id. A None
    bow reserves a dead slot (keeps entry ids aligned with an external
    store that has holes)."""
    entry = len(self._alive)
    if bow is None:
      self._alive.append(False)
      return entry
    self._alive.append(True)
    words = np.flatnonzero(bow)
    for w in words:
      self._postings[w].append((entry, float(bow[w])))
    return entry

  def remove(self, entry: int):
    if 0 <= entry < len(self._alive):
      self._alive[entry] = False

  def query(self, bow: np.ndarray) -> np.ndarray:
    """Scores (num_entries,) of the query against all live entries; dead
    entries score 0."""
    scores = np.zeros(len(self._alive), np.float32)
    for w in np.flatnonzero(bow):
      qv = bow[w]
      for entry, wv in self._postings[w]:
        scores[entry] += min(qv, wv)
    if self._alive and not all(self._alive):
      scores[~np.asarray(self._alive)] = 0.0
    return scores
