// Item co-occurrence counting for the item-similarity graph.
//
// Native replacement for the O(sum n_u^2) per-user pair loop in the
// reference's build_item_similarity_graph (data/graph_builder.py:80-96),
// the dominant host cost of that path at ML-25M scale (SURVEY.md §3 hot
// loop #5). Input: ratings grouped by user (user_idx sorted ascending,
// movie_idx aligned). Every unordered movie pair within a user's group
// becomes a packed 64-bit key; keys are sorted and run-length encoded, and
// runs with count >= threshold are emitted as edges (sort+RLE beats
// hash-map counting at this scale — see the note at cooc_count).
//
// C ABI via ctypes through an opaque handle: cooc_count builds the result,
// cooc_num_edges sizes the caller's numpy buffers, cooc_fill copies out,
// cooc_free releases. cooc_count returns nullptr on allocation failure —
// the Python wrapper maps that to an exception and the caller falls back
// to the numpy path.

#include <algorithm>
#include <cstdint>
#include <memory>
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
                 int max_items_per_user) try {
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

  // unique_ptr so a push_back bad_alloc below doesn't leak the result
  // through the function-level catch.
  auto out = std::make_unique<CoocResult>();
  // threshold <= 0 means "no cutoff" (every run has count >= 1); a raw
  // size_t cast of a negative value would silently drop every edge.
  const size_t thr = threshold < 1 ? 1 : static_cast<size_t>(threshold);
  const size_t m = keys.size();
  size_t run = 0;
  while (run < m) {
    size_t end = run + 1;
    while (end < m && keys[end] == keys[run]) ++end;
    const size_t cnt = end - run;
    if (cnt >= thr) {
      out->src.push_back(static_cast<int32_t>(keys[run] / num_movies));
      out->dst.push_back(static_cast<int32_t>(keys[run] % num_movies));
      out->weight.push_back(static_cast<float>(cnt));
    }
    run = end;
  }
  return out.release();
} catch (...) {
  // C++ exceptions (e.g. bad_alloc from the tens-of-GB reservation an
  // uncapped ML-25M pair expansion can demand) must not unwind through the
  // ctypes/libffi frames — that calls std::terminate and kills the Python
  // process. A null handle triggers the caller's numpy fallback instead.
  return nullptr;
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
