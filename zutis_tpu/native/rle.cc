// COCO compressed-RLE codec, C++ implementation (independent of both
// pycocotools and the Python codec in ops/rle.py — the two implementations
// cross-validate each other, tests/test_rle_native.py).
//
// Format (the published COCO "counts" string): the mask is scanned in
// column-major order into alternating run lengths starting with a zero-run;
// each count is delta-coded against count[i-2] for i > 2 and emitted as
// little-endian 5-bit groups with bit 5 as the continuation flag, each group
// offset by ASCII 48.
//
// Exposed via ctypes (zutis_tpu/native/__init__.py builds librle.so with g++
// on first use); used for batch encode on the eval path where Python-loop
// overhead would throttle throughput.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// mask: row-major [h, w] uint8 (as numpy hands it over); internally scanned
// column-major per the COCO format. Returns the number of chars written to
// `out`, or -1 if out_cap is too small.
int rle_encode(const uint8_t* mask, int h, int w, char* out, int out_cap) {
  std::vector<int64_t> counts;
  counts.reserve(64);
  uint8_t prev = 0;
  int64_t run = 0;
  for (int j = 0; j < w; ++j) {
    for (int i = 0; i < h; ++i) {
      uint8_t v = mask[(int64_t)i * w + j] ? 1 : 0;
      if (v == prev) {
        ++run;
      } else {
        counts.push_back(run);
        prev = v;
        run = 1;
      }
    }
  }
  counts.push_back(run);
  // counts[0] is the leading zero-run (possibly 0 when mask[0,0] == 1)

  int pos = 0;
  for (size_t idx = 0; idx < counts.size(); ++idx) {
    int64_t x = counts[idx];
    if (idx > 2) x -= counts[idx - 2];
    bool more = true;
    while (more) {
      int chunk = (int)(x & 0x1F);
      x >>= 5;
      more = (chunk & 0x10) ? (x != -1) : (x != 0);
      if (more) chunk |= 0x20;
      if (pos >= out_cap) return -1;
      out[pos++] = (char)(chunk + 48);
    }
  }
  return pos;
}

// Decodes `s` (slen chars) into a row-major [h, w] uint8 mask. Returns 0 on
// success, -1 on malformed input or size mismatch.
int rle_decode(const char* s, int slen, int h, int w, uint8_t* out) {
  std::vector<int64_t> counts;
  counts.reserve(64);
  int p = 0;
  while (p < slen) {
    int64_t x = 0;
    int k = 0;
    bool more = true;
    while (more) {
      if (p >= slen) return -1;
      int c = s[p++] - 48;
      x |= (int64_t)(c & 0x1F) << (5 * k);
      more = (c & 0x20) != 0;
      if (!more && (c & 0x10)) x |= -((int64_t)1 << (5 * k + 5));
      ++k;
    }
    if (counts.size() > 2) x += counts[counts.size() - 2];
    counts.push_back(x);
  }

  std::memset(out, 0, (size_t)h * w);
  int64_t total = (int64_t)h * w;
  int64_t pos = 0;
  uint8_t val = 0;
  for (int64_t c : counts) {
    if (c < 0 || pos + c > total) return -1;
    if (val) {
      for (int64_t t = pos; t < pos + c; ++t) {
        // column-major position t -> row-major index
        int64_t col = t / h, row = t % h;
        out[row * w + col] = 1;
      }
    }
    pos += c;
    val = 1 - val;
  }
  return pos == total ? 0 : -1;
}

// Batch encode: n masks of [h, w]; offsets[i] receives the start of mask i's
// counts string in `out`; returns total chars or -1 on overflow.
int rle_encode_batch(const uint8_t* masks, int n, int h, int w, char* out,
                     int out_cap, int* offsets) {
  int pos = 0;
  for (int i = 0; i < n; ++i) {
    offsets[i] = pos;
    int wrote = rle_encode(masks + (int64_t)i * h * w, h, w, out + pos,
                           out_cap - pos);
    if (wrote < 0) return -1;
    pos += wrote;
  }
  return pos;
}

}  // extern "C"
