// Fast host-side CSV ingest for MovieLens ratings files.
//
// Native replacement for the pandas read_csv hot spot in the ingest path
// (reference data/dataset.py:50-52 — I/O hot spot per SURVEY.md §3.1).
// ML-25M's ratings.csv is 25M rows / ~650 MB; this parser streams it in one
// pass with hand-rolled field scanning (no allocations per row) into
// caller-provided buffers, ~10x faster than pandas on this box.
//
// C ABI, loaded from Python via ctypes (no pybind11 in this image; see
// movie_recommendation_engine_tpu/utils/ingest_native.py).
//
// Expected schema: header line, then rows "userId,movieId,rating,timestamp".

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Parse a non-negative integer; advances *p past the number.
inline int64_t parse_int(const char** p, const char* end) {
  int64_t v = 0;
  const char* q = *p;
  while (q < end && *q >= '0' && *q <= '9') {
    v = v * 10 + (*q - '0');
    ++q;
  }
  *p = q;
  return v;
}

// Parse a rating like "3.5" (one optional fractional part).
inline float parse_rating(const char** p, const char* end) {
  const char* q = *p;
  int64_t whole = 0;
  while (q < end && *q >= '0' && *q <= '9') {
    whole = whole * 10 + (*q - '0');
    ++q;
  }
  float v = static_cast<float>(whole);
  if (q < end && *q == '.') {
    ++q;
    float scale = 0.1f;
    while (q < end && *q >= '0' && *q <= '9') {
      v += (*q - '0') * scale;
      scale *= 0.1f;
      ++q;
    }
  }
  *p = q;
  return v;
}

inline const char* next_line(const char* p, const char* end) {
  while (p < end && *p != '\n') ++p;
  return p < end ? p + 1 : end;
}

// Parses rows in [p, end). With null outputs, only counts parseable rows
// (the count and write passes MUST share this logic: malformed rows are
// skipped, so newline counting alone over-counts). Returns rows handled.
long long parse_range(const char* p, const char* end, int32_t* user_ids,
                      int32_t* movie_ids, float* ratings, int64_t* timestamps,
                      long long capacity) {
  long long n = 0;
  while (p < end && n < capacity) {
    if (*p < '0' || *p > '9') {  // blank/garbage line
      p = next_line(p, end);
      continue;
    }
    int64_t user = parse_int(&p, end);
    if (p >= end || *p != ',') { p = next_line(p, end); continue; }
    ++p;
    // Each remaining field must be non-empty: an empty field would parse
    // as 0 and silently accept a malformed row the pandas fallback rejects.
    if (p >= end || *p < '0' || *p > '9') { p = next_line(p, end); continue; }
    int64_t movie = parse_int(&p, end);
    if (p >= end || *p != ',') { p = next_line(p, end); continue; }
    ++p;
    // '.' is a valid first rating character (".5" parses as 0.5 — the
    // pandas fallback accepts it, so the native path must too).
    if (p >= end || ((*p < '0' || *p > '9') && *p != '.')) {
      p = next_line(p, end);
      continue;
    }
    float rating = parse_rating(&p, end);
    if (p >= end || *p != ',') { p = next_line(p, end); continue; }
    ++p;
    if (p >= end || *p < '0' || *p > '9') { p = next_line(p, end); continue; }
    int64_t ts = parse_int(&p, end);
    if (user_ids) {
      user_ids[n] = static_cast<int32_t>(user);
      movie_ids[n] = static_cast<int32_t>(movie);
      ratings[n] = rating;
      timestamps[n] = ts;
    }
    p = next_line(p, end);
    ++n;
  }
  return n;
}

}  // namespace

extern "C" {

// Counts data rows (excluding the header). Returns -1 on failure.
// Deliberately a separate full pass: callers size their numpy buffers from
// this upper bound. A stat-based bound (file_size / min_row_bytes) would
// avoid the extra sequential read but over-allocates ~4x at ML-25M scale.
long long ingest_count_rows(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  const size_t kBuf = 1 << 22;
  char* buf = static_cast<char*>(malloc(kBuf));
  if (!buf) {
    fclose(f);
    return -1;
  }
  long long newlines = 0;
  size_t got;
  while ((got = fread(buf, 1, kBuf, f)) > 0) {
    for (size_t i = 0; i < got; ++i) newlines += (buf[i] == '\n');
  }
  free(buf);
  fclose(f);
  // Header consumes one newline; a missing trailing newline means the last
  // row wasn't counted — both cases are handled by the parser returning the
  // true row count.
  return newlines;  // upper bound; parse returns the exact count
}

// Parses up to `capacity` rows into the four output arrays with
// `num_threads` worker threads (1 = fully serial, the original path).
// Row order is preserved: the file is split on line boundaries into one
// contiguous byte range per thread; a count pass sizes each thread's output
// offset (prefix sum), then a write pass parses in place. Both passes share
// parse_range so malformed-row skipping can't desynchronize offsets.
// Returns the number of rows parsed, or -1 on open failure.
long long ingest_parse_ratings_mt(const char* path, int32_t* user_ids,
                                  int32_t* movie_ids, float* ratings,
                                  int64_t* timestamps, long long capacity,
                                  int num_threads) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size < 0) {  // non-seekable file (FIFO/pipe): ftell returns -1
    fclose(f);
    return -1;
  }
  char* data = static_cast<char*>(malloc(size + 1));
  if (!data) {
    fclose(f);
    return -1;
  }
  long long got = (long long)fread(data, 1, size, f);
  fclose(f);
  if (got != size) {  // short read (truncated/racing file): let the caller
    free(data);       // fall back rather than silently parse a partial file
    return -1;
  }
  const char* begin = next_line(data, data + got);  // skip header
  const char* end = data + got;

  if (num_threads < 1) num_threads = 1;
  long long span = end - begin;
  if (num_threads == 1 || span < (1 << 20)) {
    long long n = parse_range(begin, end, user_ids, movie_ids, ratings,
                              timestamps, capacity);
    free(data);
    return n;
  }

  // Line-aligned range starts.
  std::vector<const char*> starts(num_threads + 1);
  starts[0] = begin;
  for (int t = 1; t < num_threads; ++t) {
    const char* guess = begin + span * t / num_threads;
    starts[t] = guess < end ? next_line(guess, end) : end;
    if (starts[t] < starts[t - 1]) starts[t] = starts[t - 1];
  }
  starts[num_threads] = end;

  // Pass 1: per-range valid-row counts.
  std::vector<long long> counts(num_threads, 0);
  {
    std::vector<std::thread> ws;
    for (int t = 0; t < num_threads; ++t) {
      ws.emplace_back([&, t] {
        counts[t] = parse_range(starts[t], starts[t + 1], nullptr, nullptr,
                                nullptr, nullptr, capacity);
      });
    }
    for (auto& w : ws) w.join();
  }
  // Clamp per-range counts so the cumulative total never exceeds capacity:
  // the MT path then truncates to the first `capacity` rows, matching the
  // serial path's semantics (previously it returned -1 here, which was
  // indistinguishable from an open failure).
  std::vector<long long> offsets(num_threads + 1, 0);
  for (int t = 0; t < num_threads; ++t) {
    long long room = capacity - offsets[t];
    if (counts[t] > room) counts[t] = room < 0 ? 0 : room;
    offsets[t + 1] = offsets[t] + counts[t];
  }

  // Pass 2: parse into disjoint output slices.
  {
    std::vector<std::thread> ws;
    for (int t = 0; t < num_threads; ++t) {
      ws.emplace_back([&, t] {
        parse_range(starts[t], starts[t + 1], user_ids + offsets[t],
                    movie_ids + offsets[t], ratings + offsets[t],
                    timestamps + offsets[t], counts[t]);
      });
    }
    for (auto& w : ws) w.join();
  }
  free(data);
  return offsets[num_threads];
}

// Single-threaded entry kept for ABI compatibility.
long long ingest_parse_ratings(const char* path, int32_t* user_ids,
                               int32_t* movie_ids, float* ratings,
                               int64_t* timestamps, long long capacity) {
  return ingest_parse_ratings_mt(path, user_ids, movie_ids, ratings,
                                 timestamps, capacity, 1);
}

}  // extern "C"
