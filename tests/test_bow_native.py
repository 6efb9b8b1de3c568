"""Native BoW vocabulary backend (native/bow.cc) vs the numpy reference.

The two backends share construction semantics (hierarchical k-medians,
majority-vote centroids, leaf/empty-cluster/tie rules) but not RNG streams,
so parity is asserted behaviorally: clustering purity, retrieval ordering,
and determinism — the same contract the detector relies on. Mirrors the
reference's DBoW2 (C++) sitting under loop_detector.cc:150-179.
"""

import numpy as np
import pytest

from badslam_tpu.loop import bow

pytestmark = pytest.mark.skipif(
    bow.native_vocab_lib() is None,
    reason="native library not built (make -C native)")


def _clustered_descriptors(rng, n_clusters=40, per_cluster=60, flip_bits=8):
  """Packed 32-byte descriptors in well-separated Hamming clusters."""
  protos = rng.integers(0, 256, size=(n_clusters, 32), dtype=np.uint8)
  descs, labels = [], []
  for c in range(n_clusters):
    base = np.unpackbits(protos[c])
    for _ in range(per_cluster):
      bits = base.copy()
      idx = rng.choice(256, size=flip_bits, replace=False)
      bits[idx] ^= 1
      descs.append(np.packbits(bits))
      labels.append(c)
  return np.stack(descs), np.asarray(labels)


def _purity(words, labels):
  """Fraction of descriptors whose word is the majority word of their
  cluster — 1.0 means every cluster quantizes to a single word."""
  correct = 0
  for c in np.unique(labels):
    w = words[labels == c]
    correct += np.bincount(w).max()
  return correct / len(words)


def test_native_matches_numpy_clustering_quality():
  rng = np.random.default_rng(7)
  descs, labels = _clustered_descriptors(rng)
  v_nat = bow.BinaryVocabulary(branching=10, depth=3, backend="native")
  v_np = bow.BinaryVocabulary(branching=10, depth=3, backend="numpy")
  v_nat.fit(descs)
  v_np.fit(descs)
  w_nat = v_nat.transform(descs)
  w_np = v_np.transform(descs)
  p_nat, p_np = _purity(w_nat, labels), _purity(w_np, labels)
  # The tree deliberately over-partitions (up to branching^depth words for
  # 40 clusters), so clusters split across several words and absolute purity
  # sits well below 1 for BOTH backends — the parity claim is that they
  # land together (measured ~0.68 each on this corpus).
  assert p_nat > 0.5, p_nat
  assert p_np > 0.5, p_np
  assert abs(p_nat - p_np) < 0.05
  # Word id ranges are sane.
  assert 0 <= w_nat.min() and w_nat.max() < v_nat.num_words
  assert v_nat.num_words > 40  # enough words to separate 40 clusters


def test_native_deterministic_and_seed_sensitive():
  rng = np.random.default_rng(3)
  descs, _ = _clustered_descriptors(rng, n_clusters=12, per_cluster=30)
  a = bow.BinaryVocabulary(branching=6, depth=2, seed=5, backend="native")
  b = bow.BinaryVocabulary(branching=6, depth=2, seed=5, backend="native")
  c = bow.BinaryVocabulary(branching=6, depth=2, seed=9, backend="native")
  a.fit(descs)
  b.fit(descs)
  c.fit(descs)
  np.testing.assert_array_equal(a.transform(descs), b.transform(descs))
  assert a.num_words == b.num_words
  # A different seed re-partitions at least something (not a fixed tree).
  assert (a.transform(descs) != c.transform(descs)).any()


def test_native_retrieval_ordering_matches_numpy():
  """End-to-end BoW scoring: a re-observation of the same place must
  out-score unrelated places under both backends."""
  rng = np.random.default_rng(11)
  descs, labels = _clustered_descriptors(rng, n_clusters=30, per_cluster=40)
  # "Keyframes" = disjoint groups of 5 clusters; the query re-observes
  # keyframe 0's clusters with fresh per-descriptor noise.
  groups = [descs[np.isin(labels, range(5 * g, 5 * g + 5))]
            for g in range(6)]
  query_src = np.unpackbits(groups[0], axis=1)
  flip = rng.integers(0, 2, size=query_src.shape).astype(np.uint8)
  flip &= (rng.random(query_src.shape) < 0.03).astype(np.uint8)
  query = np.packbits(query_src ^ flip, axis=1)

  for backend in ("native", "numpy"):
    v = bow.BinaryVocabulary(branching=10, depth=3, backend=backend)
    v.fit(descs)
    word_lists = [v.transform(g) for g in groups]
    v.fit_idf(word_lists)
    db = np.stack([v.bow_vector(w) for w in word_lists])
    scores = bow.l1_score(v.bow_vector(v.transform(query)), db)
    assert scores.argmax() == 0, (backend, scores)
    assert scores[0] > 2.0 * np.delete(scores, 0).max(), (backend, scores)


def test_native_edge_cases():
  lib = bow.native_vocab_lib()
  assert lib is not None
  # Fewer descriptors than branching -> single-word vocabulary.
  rng = np.random.default_rng(0)
  few = rng.integers(0, 256, size=(3, 32), dtype=np.uint8)
  v = bow.BinaryVocabulary(branching=10, depth=3, backend="native")
  v.fit(few)
  assert v.num_words == 1
  np.testing.assert_array_equal(v.transform(few), [0, 0, 0])
  # Empty transform.
  assert v.transform(np.zeros((0, 32), np.uint8)).shape == (0,)
  # Descriptor-length mismatch raises.
  with pytest.raises(ValueError):
    v.transform(np.zeros((2, 16), np.uint8))


def test_detector_default_uses_native_backend():
  """BinaryVocabulary(backend='auto') — what LoopDetector constructs —
  must pick the native path when the library is built."""
  rng = np.random.default_rng(1)
  descs, _ = _clustered_descriptors(rng, n_clusters=8, per_cluster=20)
  v = bow.BinaryVocabulary(branching=5, depth=2)
  v.fit(descs)
  assert v._handle is not None
  assert v.num_words > 1
