// Item co-occurrence counting for the item-similarity graph.
//
// Native replacement for the O(sum n_u^2) per-user pair loop in the
// reference's build_item_similarity_graph (data/graph_builder.py:80-96),
// the dominant host cost of that path at ML-25M scale (SURVEY.md §3 hot
// loop #5). Input: ratings grouped by user (user_idx sorted ascending,
// movie_idx aligned). Every unordered movie pair within a user's group
// increments a hash-map counter; pairs with count >= threshold are emitted.
//
// C ABI via ctypes (two-call pattern: count pass then fill pass would need
// the map twice, so instead one call fills caller-grown buffers through an
// opaque handle).

#include <algorithm>
#include <cstdint>
#include <unordered_map>
#include <vector>

namespace {

struct CoocResult {
  std::vector<int32_t> src;
  std::vector<int32_t> dst;
  std::vector<float> weight;
};

}  // namespace

extern "C" {

// Counts co-occurrences and materializes edges with count >= threshold.
// user_idx must be sorted ascending; movie_idx aligned; n = rows.
// max_items_per_user <= 0 disables the cap (exact reference semantics);
// otherwise each user's item list is truncated after the first cap items
// (deterministic, unlike the Python path's random subsample — callers that
// need sampling do it before the call).
// Returns an opaque handle; query sizes and copy out, then free.
void* cooc_count(const int64_t* user_idx, const int64_t* movie_idx,
                 long long n, long long num_movies, int threshold,
                 int max_items_per_user) {
  // Sort-based counting: materialize every pair key, sort, run-length
  // encode. Beats hash-map counting by a wide margin at this scale (sorting
  // 64-bit keys is cache-friendly; hashing 50M keys is not).
  std::vector<uint64_t> keys;
  {
    // First pass: total pair count for one exact reservation.
    size_t total = 0;
    long long i = 0;
    while (i < n) {
      long long j = i;
      const int64_t u = user_idx[i];
      while (j < n && user_idx[j] == u) ++j;
      size_t g = static_cast<size_t>(j - i);
      if (max_items_per_user > 0 &&
          g > static_cast<size_t>(max_items_per_user)) {
        g = static_cast<size_t>(max_items_per_user);
      }
      total += g * (g - 1) / 2;
      i = j;
    }
    keys.reserve(total);
  }

  long long i = 0;
  std::vector<int64_t> items;
  while (i < n) {
    long long j = i;
    items.clear();
    const int64_t u = user_idx[i];
    while (j < n && user_idx[j] == u) {
      if (max_items_per_user <= 0 ||
          items.size() < static_cast<size_t>(max_items_per_user)) {
        items.push_back(movie_idx[j]);
      }
      ++j;
    }
    for (size_t a = 0; a < items.size(); ++a) {
      const int64_t ia = items[a];
      for (size_t b = a + 1; b < items.size(); ++b) {
        int64_t lo = ia, hi = items[b];
        if (lo == hi) continue;
        if (lo > hi) std::swap(lo, hi);
        keys.push_back(static_cast<uint64_t>(lo) * num_movies + hi);
      }
    }
    i = j;
  }

  std::sort(keys.begin(), keys.end());

  auto* out = new CoocResult();
  const size_t m = keys.size();
  size_t run = 0;
  while (run < m) {
    size_t end = run + 1;
    while (end < m && keys[end] == keys[run]) ++end;
    const size_t cnt = end - run;
    if (cnt >= static_cast<size_t>(threshold)) {
      out->src.push_back(static_cast<int32_t>(keys[run] / num_movies));
      out->dst.push_back(static_cast<int32_t>(keys[run] % num_movies));
      out->weight.push_back(static_cast<float>(cnt));
    }
    run = end;
  }
  return out;
}

long long cooc_num_edges(void* handle) {
  return static_cast<CoocResult*>(handle)->src.size();
}

void cooc_fill(void* handle, int32_t* src, int32_t* dst, float* weight) {
  auto* r = static_cast<CoocResult*>(handle);
  std::copy(r->src.begin(), r->src.end(), src);
  std::copy(r->dst.begin(), r->dst.end(), dst);
  std::copy(r->weight.begin(), r->weight.end(), weight);
}

void cooc_free(void* handle) { delete static_cast<CoocResult*>(handle); }

}  // extern "C"
