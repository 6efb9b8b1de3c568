// Native hierarchical binary bag-of-words vocabulary.
//
// Backend for badslam_tpu/loop/bow.py: the reference links DBoW2 (C++) for
// its BoW retrieval layer (loop_detector.cc:150-179); this provides the same
// mechanism — a hierarchical k-medians tree over binary descriptors with
// Hamming-metric majority-vote centroids (Galvez-Lopez & Tardos, TRO 2012) —
// as a small C library. The Python fallback in bow.py implements identical
// construction semantics (leaf/empty-cluster/tie-breaking rules); trees are
// not bit-identical across backends because the RNG streams differ.
//
// Exposed via ctypes (badslam_tpu/loop/bow.py::_native_vocab_lib):
//   bow_fit(descriptors, n, desc_bytes, branching, depth, seed) -> handle
//   bow_num_words(handle) -> int
//   bow_transform(handle, descriptors, n, desc_bytes, out_words)
//   bow_free(handle)
//
// Single-threaded: vocabulary training runs on the loop-detection thread,
// off the TPU hot path, exactly as DBoW2 does in the reference.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

// 64-bit mixer (splitmix64) for deterministic, platform-stable seeding.
inline uint64_t splitmix64(uint64_t& state) {
  uint64_t z = (state += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

struct Rng {
  uint64_t state;
  explicit Rng(uint64_t seed) : state(seed) {}
  // Uniform integer in [0, bound) without modulo bias (bound < 2^32).
  uint32_t below(uint32_t bound) {
    uint64_t r = splitmix64(state);
    return static_cast<uint32_t>((r >> 32) * static_cast<uint64_t>(bound) >>
                                 32);
  }
};

struct Node {
  int k = 0;                       // number of centers
  std::vector<uint64_t> centers;   // k * words64, row-major
  std::vector<int32_t> children;   // node id >= 0, or leaf word -(w+1)
};

struct Vocab {
  int words64 = 0;     // packed 64-bit words per descriptor
  int desc_bytes = 0;  // original descriptor byte length
  int branching = 10;
  int num_words = 0;
  int32_t root = 0;    // node id, or leaf encoding for degenerate vocabs
  std::vector<Node> nodes;
};

inline int hamming(const uint64_t* a, const uint64_t* b, int w) {
  int d = 0;
  for (int i = 0; i < w; ++i) d += __builtin_popcountll(a[i] ^ b[i]);
  return d;
}

// Packs (n, desc_bytes) uint8 rows into (n, words64) uint64 rows.
std::vector<uint64_t> pack_rows(const uint8_t* desc, int n, int desc_bytes,
                                int words64) {
  std::vector<uint64_t> out(static_cast<size_t>(n) * words64, 0);
  for (int i = 0; i < n; ++i) {
    std::memcpy(&out[static_cast<size_t>(i) * words64], desc + i * desc_bytes,
                desc_bytes);
  }
  return out;
}

class Builder {
 public:
  Builder(Vocab* v, const std::vector<uint64_t>& rows, int n)
      : v_(v), rows_(rows), n_(n), w_(v->words64) {}

  // Builds the subtree over the point subset `idx`; returns the node id
  // (>= 0) or leaf word encoding (< 0). Mirrors bow.py::_build.
  int32_t build(std::vector<int32_t>& idx, int depth, Rng& rng) {
    const int k = v_->branching;
    if (depth == 0 || static_cast<int>(idx.size()) <= k) {
      return -(v_->num_words++ + 1);
    }
    std::vector<uint64_t> centers;
    std::vector<int> assign;
    kmedians(idx, k, rng, &centers, &assign);
    const int kk = static_cast<int>(centers.size()) / w_;

    const int32_t node = static_cast<int32_t>(v_->nodes.size());
    v_->nodes.emplace_back();
    v_->nodes[node].k = kk;
    v_->nodes[node].centers = std::move(centers);
    v_->nodes[node].children.assign(kk, 0);

    // Partition the subset by cluster and recurse.
    std::vector<std::vector<int32_t>> members(kk);
    for (size_t i = 0; i < idx.size(); ++i) {
      members[assign[i]].push_back(idx[i]);
    }
    for (int j = 0; j < kk; ++j) {
      int32_t child;
      if (members[j].empty()) {
        child = -(v_->num_words++ + 1);  // unused word keeps ids aligned
      } else {
        child = build(members[j], depth - 1, rng);
      }
      v_->nodes[node].children[j] = child;
    }
    return node;
  }

 private:
  const uint64_t* row(int32_t i) const {
    return &rows_[static_cast<size_t>(i) * w_];
  }

  // Binary k-medians under Hamming distance: majority-vote centroids,
  // empty-cluster reseed on the point farthest from all (old) centers,
  // ties in assignment break to the lowest center index. 8 iterations or
  // until centers stop changing (bow.py::_kmedians).
  void kmedians(const std::vector<int32_t>& idx, int k, Rng& rng,
                std::vector<uint64_t>* out_centers,
                std::vector<int>* out_assign) {
    const int n = static_cast<int>(idx.size());
    // Initial centers: k distinct points (partial Fisher-Yates).
    std::vector<int32_t> pool(idx);
    for (int j = 0; j < k; ++j) {
      const uint32_t pick = j + rng.below(n - j);
      std::swap(pool[j], pool[pick]);
    }
    std::vector<uint64_t> centers(static_cast<size_t>(k) * w_);
    for (int j = 0; j < k; ++j) {
      std::memcpy(&centers[static_cast<size_t>(j) * w_], row(pool[j]),
                  w_ * 8);
    }

    std::vector<int> assign(n, 0);
    std::vector<int> mind(n, 0);
    std::vector<uint64_t> next(static_cast<size_t>(k) * w_);
    std::vector<int32_t> counts(static_cast<size_t>(k) * w_ * 64);
    std::vector<int> sizes(k);
    for (int iter = 0; iter < 8; ++iter) {
      // Assignment + per-point min distance (for farthest-point reseed).
      for (int i = 0; i < n; ++i) {
        const uint64_t* p = row(idx[i]);
        int best = 0, bestd = hamming(p, &centers[0], w_);
        for (int j = 1; j < k; ++j) {
          const int d = hamming(p, &centers[static_cast<size_t>(j) * w_], w_);
          if (d < bestd) {
            bestd = d;
            best = j;
          }
        }
        assign[i] = best;
        mind[i] = bestd;
      }
      int farthest = 0;
      for (int i = 1; i < n; ++i) {
        if (mind[i] > mind[farthest]) farthest = i;
      }
      // Majority-vote centroids: per-center bit counts.
      std::fill(counts.begin(), counts.end(), 0);
      std::fill(sizes.begin(), sizes.end(), 0);
      for (int i = 0; i < n; ++i) {
        const uint64_t* p = row(idx[i]);
        int32_t* c = &counts[static_cast<size_t>(assign[i]) * w_ * 64];
        for (int wi = 0; wi < w_; ++wi) {
          uint64_t bits = p[wi];
          while (bits) {
            const int b = __builtin_ctzll(bits);
            ++c[wi * 64 + b];
            bits &= bits - 1;
          }
        }
        ++sizes[assign[i]];
      }
      for (int j = 0; j < k; ++j) {
        uint64_t* cj = &next[static_cast<size_t>(j) * w_];
        if (sizes[j] == 0) {
          std::memcpy(cj, row(idx[farthest]), w_ * 8);
          continue;
        }
        const int32_t* c = &counts[static_cast<size_t>(j) * w_ * 64];
        const int half = sizes[j];  // bit set iff 2*count >= members
        for (int wi = 0; wi < w_; ++wi) {
          uint64_t word = 0;
          for (int b = 0; b < 64; ++b) {
            if (2 * c[wi * 64 + b] >= half) word |= (1ULL << b);
          }
          cj[wi] = word;
        }
      }
      if (next == centers) break;
      centers.swap(next);
    }
    // Final assignment against the converged centers.
    for (int i = 0; i < n; ++i) {
      const uint64_t* p = row(idx[i]);
      int best = 0, bestd = hamming(p, &centers[0], w_);
      for (int j = 1; j < k; ++j) {
        const int d = hamming(p, &centers[static_cast<size_t>(j) * w_], w_);
        if (d < bestd) {
          bestd = d;
          best = j;
        }
      }
      assign[i] = best;
    }
    *out_centers = std::move(centers);
    *out_assign = std::move(assign);
  }

  Vocab* v_;
  const std::vector<uint64_t>& rows_;
  int n_;
  int w_;
};

}  // namespace

extern "C" {

void* bow_fit(const uint8_t* descriptors, int n, int desc_bytes,
              int branching, int depth, uint64_t seed) {
  if (desc_bytes <= 0 || branching < 2 || depth < 0 || n < 0) return nullptr;
  Vocab* v = new Vocab();
  v->desc_bytes = desc_bytes;
  v->words64 = (desc_bytes + 7) / 8;
  v->branching = branching;
  const std::vector<uint64_t> rows =
      pack_rows(descriptors, n, desc_bytes, v->words64);
  Rng rng(seed * 0x9e3779b97f4a7c15ULL + 1);
  std::vector<int32_t> idx(n);
  for (int i = 0; i < n; ++i) idx[i] = i;
  Builder b(v, rows, n);
  v->root = b.build(idx, depth, rng);
  return v;
}

int bow_num_words(void* handle) {
  return handle ? static_cast<Vocab*>(handle)->num_words : 0;
}

int bow_tree_nodes(void* handle) {
  return handle ? static_cast<int>(static_cast<Vocab*>(handle)->nodes.size())
                : 0;
}

// desc_bytes must match the fit-time descriptor length; returns 0 on
// success, nonzero on mismatch.
int bow_transform(void* handle, const uint8_t* descriptors, int n,
                  int desc_bytes, int32_t* out_words) {
  if (!handle) return 1;
  const Vocab* v = static_cast<const Vocab*>(handle);
  if (desc_bytes != v->desc_bytes) return 2;
  const int w = v->words64;
  std::vector<uint64_t> packed = pack_rows(descriptors, n, desc_bytes, w);
  for (int i = 0; i < n; ++i) {
    const uint64_t* p = &packed[static_cast<size_t>(i) * w];
    int32_t cur = v->root;
    while (cur >= 0) {
      const Node& node = v->nodes[cur];
      int best = 0, bestd = hamming(p, &node.centers[0], w);
      for (int j = 1; j < node.k; ++j) {
        const int d =
            hamming(p, &node.centers[static_cast<size_t>(j) * w], w);
        if (d < bestd) {
          bestd = d;
          best = j;
        }
      }
      cur = node.children[best];
    }
    out_words[i] = -(cur + 1);
  }
  return 0;
}

void bow_free(void* handle) { delete static_cast<Vocab*>(handle); }

}  // extern "C"
