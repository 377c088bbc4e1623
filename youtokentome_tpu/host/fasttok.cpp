// Native host corpus preprocessing for encoding/training.
//
// TPU-native equivalent of the reference's C++ host loops (UTF-8 decode
// utf8.cpp:37-128, word counting/dedup bpe.cpp:388-418, unknown-run
// collapse bpe.cpp:1503-1527) — written fresh for this framework's
// pipeline: the host extracts *unique* words once, the device merges
// them, and the host expands results back to the occurrence stream.
//
// Word spans are found directly on the raw bytes: ASCII whitespace bytes
// never occur inside multi-byte UTF-8 chars, and U+2581's encoding
// (E2 96 81) cannot start inside another char's tail (tail bytes are
// 80..BF), so byte-level splitting agrees with codepoint-level
// splitting.  Dedup keys are raw byte spans (equal bytes => equal ids),
// with exact comparison on hash hits.
//
// All functions return -1 on insufficient capacity (caller grows and
// retries) and are exposed via ctypes (see fasttok.py).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

const uint32_t INVALID_CP = 0x0FFFFFFF;
const int32_t PLACEHOLDER_START = 1000000000;

inline bool is_space_byte(uint8_t b) {
  return b == 0x20 || (b >= 0x09 && b <= 0x0D);
}

inline bool is_meta_space(const uint8_t *p, long remaining) {
  return remaining >= 3 && p[0] == 0xE2 && p[1] == 0x96 && p[2] == 0x81;
}

inline bool check_cp(uint32_t x) {
  return x < 0xD800 || (0xDFFF < x && x < 0x110000);
}

inline bool cont(uint8_t x) { return (x & 0xC0) == 0x80; }

// Decode one char; returns codepoint (INVALID_CP on bad input) and
// advances *len (1 on bad input) — reference semantics utf8.cpp:37-74.
inline uint32_t decode_char(const uint8_t *p, long remaining, int *len) {
  uint8_t b0 = p[0];
  if (b0 < 0x80) {
    *len = 1;
    return b0;
  }
  if ((b0 & 0xE0) == 0xC0 && remaining >= 2 && cont(p[1])) {
    uint32_t v = ((b0 & 0x1Fu) << 6) | (p[1] & 0x3Fu);
    if (v >= 0x80 && check_cp(v)) {
      *len = 2;
      return v;
    }
  } else if ((b0 & 0xF0) == 0xE0 && remaining >= 3 && cont(p[1]) && cont(p[2])) {
    uint32_t v = ((b0 & 0x0Fu) << 12) | ((p[1] & 0x3Fu) << 6) | (p[2] & 0x3Fu);
    if (v >= 0x800 && check_cp(v)) {
      *len = 3;
      return v;
    }
  } else if ((b0 & 0xF8) == 0xF0 && remaining >= 4 && cont(p[1]) && cont(p[2]) &&
             cont(p[3])) {
    uint32_t v = ((b0 & 0x07u) << 18) | ((p[1] & 0x3Fu) << 12) |
                 ((p[2] & 0x3Fu) << 6) | (p[3] & 0x3Fu);
    if (v >= 0x10000 && check_cp(v)) {
      *len = 4;
      return v;
    }
  }
  *len = 1;
  return INVALID_CP;
}

inline uint64_t hash_bytes(const uint8_t *p, long n) {
  uint64_t h = 1469598103934665603ull;  // FNV-1a 64
  for (long i = 0; i < n; i++) {
    h ^= p[i];
    h *= 1099511628211ull;
  }
  return h;
}

// Open-addressing map codepoint -> id.
struct CharMap {
  std::vector<uint32_t> keys;
  std::vector<int32_t> vals;
  uint64_t mask;

  void build(const uint32_t *cps, const int32_t *ids, long n) {
    uint64_t cap = 16;
    while (cap < (uint64_t)n * 2) cap <<= 1;
    mask = cap - 1;
    keys.assign(cap, 0xFFFFFFFFu);
    vals.assign(cap, -1);
    for (long i = 0; i < n; i++) {
      uint64_t h = (cps[i] * 0x9E3779B97F4A7C15ull) >> 32;
      uint64_t s = h & mask;
      while (keys[s] != 0xFFFFFFFFu) s = (s + 1) & mask;
      keys[s] = cps[i];
      vals[s] = ids[i];
    }
  }

  inline int32_t get(uint32_t cp) const {
    uint64_t h = (cp * 0x9E3779B97F4A7C15ull) >> 32;
    uint64_t s = h & mask;
    while (true) {
      if (keys[s] == cp) return vals[s];
      if (keys[s] == 0xFFFFFFFFu) return -1;
      s = (s + 1) & mask;
    }
  }
};

// Open-addressing map over raw byte spans -> uid, exact compare.
struct WordMap {
  struct Slot {
    const uint8_t *ptr;
    int32_t len;
    int32_t uid;
  };
  std::vector<Slot> slots;
  uint64_t mask;
  long count = 0;

  void init(long expect) {
    uint64_t cap = 1024;
    while (cap < (uint64_t)expect * 2) cap <<= 1;
    mask = cap - 1;
    slots.assign(cap, {nullptr, 0, -1});
    count = 0;
  }

  // Returns uid; sets *fresh when newly inserted.
  inline int32_t get_or_add(const uint8_t *p, long n, bool *fresh) {
    if ((uint64_t)(count * 2) >= mask + 1) grow();
    uint64_t s = hash_bytes(p, n) & mask;
    while (true) {
      Slot &sl = slots[s];
      if (sl.ptr == nullptr) {
        sl.ptr = p;
        sl.len = (int32_t)n;
        sl.uid = (int32_t)count;
        count++;
        *fresh = true;
        return sl.uid;
      }
      if (sl.len == (int32_t)n && memcmp(sl.ptr, p, n) == 0) {
        *fresh = false;
        return sl.uid;
      }
      s = (s + 1) & mask;
    }
  }

  void grow() {
    std::vector<Slot> old = std::move(slots);
    uint64_t cap = (mask + 1) * 2;
    mask = cap - 1;
    slots.assign(cap, {nullptr, 0, -1});
    for (auto &sl : old) {
      if (sl.ptr == nullptr) continue;
      uint64_t s = hash_bytes(sl.ptr, sl.len) & mask;
      while (slots[s].ptr != nullptr) s = (s + 1) & mask;
      slots[s] = sl;
    }
  }
};

}  // namespace

extern "C" {

// Tokenize a newline-separated byte stream into a unique-word table and
// an occurrence stream.
//
// Outputs:
//   words_flat [words_cap]  unique words as id sequences, space-prefixed
//   word_off   [uniq_cap+1] offsets into words_flat
//   occ_stream [occ_cap]    per item: uid >= 0, or -1 for '\n'
//   uid_counts [uniq_cap]   occurrence count per unique word
//   out[0..3] = n_words_flat, n_unique, n_occ, error(0 ok, -1 capacity)
void yttm_tokenize(const uint8_t *data, long n, const uint32_t *alpha_cps,
                   const int32_t *alpha_ids, long n_alpha, int32_t space_id,
                   int32_t *words_flat, long words_cap, int32_t *word_off,
                   long uniq_cap, int32_t *occ_stream, long occ_cap,
                   int64_t *uid_counts, int64_t *out) {
  CharMap cmap;
  cmap.build(alpha_cps, alpha_ids, n_alpha);
  WordMap wmap;
  wmap.init(1024);

  long flat = 0;
  long occ = 0;
  word_off[0] = 0;

  long i = 0;
  while (i < n) {
    uint8_t b = data[i];
    if (b == 0x0A) {
      if (occ >= occ_cap) { out[3] = -1; return; }
      occ_stream[occ++] = -1;
      i++;
      continue;
    }
    if (is_space_byte(b)) {
      i++;
      continue;
    }
    if (is_meta_space(data + i, n - i)) {
      i += 3;
      continue;
    }
    // word span over raw bytes
    long ws = i;
    while (i < n) {
      uint8_t c = data[i];
      if (is_space_byte(c) || is_meta_space(data + i, n - i)) break;
      i++;
    }
    long we = i;
    bool fresh = false;
    int32_t uid = wmap.get_or_add(data + ws, we - ws, &fresh);
    if (fresh) {
      if ((long)wmap.count >= uniq_cap) { out[3] = -1; return; }
      uid_counts[uid] = 0;
      // decode + id-ify with unknown-run collapse
      if (flat >= words_cap) { out[3] = -1; return; }
      words_flat[flat++] = space_id;
      long j = ws;
      bool in_unknown = false;
      int32_t next_ph = PLACEHOLDER_START;
      while (j < we) {
        int len;
        uint32_t cp = decode_char(data + j, we - j, &len);
        j += len;
        if (cp == INVALID_CP) continue;  // dropped (decode_utf8 skips)
        int32_t id = cmap.get(cp);
        if (id >= 0) {
          if (flat >= words_cap) { out[3] = -1; return; }
          words_flat[flat++] = id;
          in_unknown = false;
        } else {
          if (!in_unknown) {
            if (flat >= words_cap) { out[3] = -1; return; }
            words_flat[flat++] = next_ph++;
            in_unknown = true;
          }
        }
      }
      word_off[uid + 1] = (int32_t)flat;
    }
    uid_counts[uid]++;
    if (occ >= occ_cap) { out[3] = -1; return; }
    occ_stream[occ++] = uid;
  }
  out[0] = flat;
  out[1] = (long)wmap.count;
  out[2] = occ;
  out[3] = 0;
}

// Expand device results back to the occurrence stream and format as
// reference CLI text ("id id \n" per sentence).  results_flat/res_off
// describe the merged token ids of each unique word.  Returns bytes
// written, or -1 if out_cap is too small.
long yttm_expand_format(const int32_t *occ_stream, long n_occ,
                        const int32_t *results_flat, const int32_t *res_off,
                        char *out_text, long out_cap) {
  char *p = out_text;
  char *end = out_text + out_cap - 16;
  for (long i = 0; i < n_occ; i++) {
    int32_t u = occ_stream[i];
    if (u < 0) {
      if (p >= end) return -1;
      *p++ = '\n';
      continue;
    }
    for (int32_t j = res_off[u]; j < res_off[u + 1]; j++) {
      if (p >= end) return -1;
      int32_t v = results_flat[j];
      char tmp[12];
      int k = 0;
      if (v < 0) *p++ = '-', v = -v;
      do {
        tmp[k++] = '0' + (v % 10);
        v /= 10;
      } while (v);
      while (k) *p++ = tmp[--k];
      *p++ = ' ';
    }
  }
  return p - out_text;
}

// Expand device results into a flat id array with -1 sentinels at
// sentence boundaries.  Returns token count, or -1 on capacity.
long yttm_expand_ids(const int32_t *occ_stream, long n_occ,
                     const int32_t *results_flat, const int32_t *res_off,
                     int32_t *out_ids, long out_cap) {
  long m = 0;
  for (long i = 0; i < n_occ; i++) {
    int32_t u = occ_stream[i];
    if (u < 0) {
      if (m >= out_cap) return -1;
      out_ids[m++] = -1;
      continue;
    }
    int32_t a = res_off[u], b = res_off[u + 1];
    if (m + (b - a) > out_cap) return -1;
    for (int32_t j = a; j < b; j++) out_ids[m++] = results_flat[j];
  }
  return m;
}

}  // extern "C"
