// sickle-tpu native host I/O: FASTQ line index + validate + pack, and
// trimmed-output assembly.  TPU-native replacement for the reference's
// GZReader/Batch/FQEntry/stringstream writer stack
// (/root/reference/src/GZReader.cpp, Batch.cpp, FQEntry.cpp,
// trim_single.cpp:374-427) — but single-pass, zero-per-line allocation,
// and operating entirely inside caller-provided reusable buffers (this
// container's page-fault cost makes fresh allocations ~300x slower than
// warm ones; see io/native.py).
//
// Exposed via ctypes (no pybind11 in this image).  All functions are
// thread-parallel over records where it pays.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

void parallel_for(int64_t n, int n_threads, void (*body)(int64_t, int64_t, void*),
                  void* ctx) {
  if (n <= 0) return;
  int t = std::max(1, n_threads);
  if (t == 1 || n < 4096) {
    body(0, n, ctx);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (n + t - 1) / t;
  for (int i = 0; i < t; i++) {
    int64_t lo = i * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back([=] { body(lo, hi, ctx); });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Count '\n' bytes exactly (memchr loop; multi-GB/s).
int64_t sk_count_newlines(const uint8_t* data, int64_t n) {
  int64_t count = 0;
  const uint8_t* p = data;
  const uint8_t* end = data + n;
  while (p < end) {
    const uint8_t* q = static_cast<const uint8_t*>(memchr(p, '\n', end - p));
    if (!q) break;
    count++;
    p = q + 1;
  }
  return count;
}

// Byte index of the k-th (1-based) '\n', or -1 if there are fewer than k.
int64_t sk_kth_newline(const uint8_t* data, int64_t n, int64_t k) {
  const uint8_t* p = data;
  const uint8_t* end = data + n;
  while (k > 0 && p < end) {
    const uint8_t* q = static_cast<const uint8_t*>(memchr(p, '\n', end - p));
    if (!q) return -1;
    if (--k == 0) return q - data;
    p = q + 1;
  }
  return -1;
}

// Count '\n' bytes (memchr loop; ~GB/s).
int64_t sk_count_lines(const uint8_t* data, int64_t n) {
  int64_t count = 0;
  const uint8_t* p = data;
  const uint8_t* end = data + n;
  while (p < end) {
    const uint8_t* q = static_cast<const uint8_t*>(memchr(p, '\n', end - p));
    if (!q) break;
    count++;
    p = q + 1;
  }
  // trailing unterminated line counts as a line
  if (n > 0 && data[n - 1] != '\n') count++;
  return count;
}

struct PackCtx {
  const uint8_t* data;
  const int64_t* starts4;
  const int32_t* lens4;
  int64_t L;
  uint8_t* seq;  // may alias qual when need_seq == 0
  uint8_t* qual;
  int32_t* lengths;
  int need_seq;
};

static void pack_body(int64_t lo, int64_t hi, void* vctx) {
  PackCtx* c = static_cast<PackCtx*>(vctx);
  for (int64_t r = lo; r < hi; r++) {
    int32_t len = c->lens4[4 * r + 1];
    uint8_t* qrow = c->qual + r * c->L;
    memcpy(qrow, c->data + c->starts4[4 * r + 3], len);
    memset(qrow + len, 0, c->L - len);
    if (c->need_seq) {
      uint8_t* srow = c->seq + r * c->L;
      memcpy(srow, c->data + c->starts4[4 * r + 1], len);
      memset(srow + len, 0, c->L - len);
    }
    c->lengths[r] = len;
  }
}

// One-pass parse + validate + pack.
//
// Returns: 0 ok; 1 validation error (*err_record = first offending record,
// input order); 2 row length L too small (*max_len = required).
// Trailing partial records (<4 lines) are ignored, matching the
// reference's 4-line batch alignment (src/GZReader.cpp:104-126).
int sk_parse_pack(const uint8_t* data, int64_t n, int64_t max_records,
                  int64_t L, int64_t* starts4, int32_t* lens4, uint8_t* seq,
                  uint8_t* qual, int32_t* lengths, int64_t* out_n_records,
                  int64_t* out_max_len, int64_t* err_record, int n_threads,
                  int need_seq) {
  // 1) line index (serial memchr scan)
  int64_t n_lines = 0;
  int64_t max_lines = max_records * 4;
  const uint8_t* p = data;
  const uint8_t* end = data + n;
  while (p < end && n_lines < max_lines) {
    const uint8_t* q = static_cast<const uint8_t*>(memchr(p, '\n', end - p));
    const uint8_t* line_end = q ? q : end;
    starts4[n_lines] = p - data;
    lens4[n_lines] = static_cast<int32_t>(line_end - p);
    n_lines++;
    if (!q) break;
    p = q + 1;
  }
  int64_t n_records = n_lines / 4;
  *out_n_records = n_records;

  // 2) validate + max length (serial; touches only metadata + 1 byte/record)
  int64_t max_len = 0;
  for (int64_t r = 0; r < n_records; r++) {
    int32_t name_len = lens4[4 * r];
    int32_t seq_len = lens4[4 * r + 1];
    int32_t qual_len = lens4[4 * r + 3];
    if (name_len <= 1 || data[starts4[4 * r]] != '@' || seq_len < 1 ||
        qual_len < 1 || seq_len != qual_len) {
      *err_record = r;
      return 1;
    }
    if (seq_len > max_len) max_len = seq_len;
  }
  *out_max_len = max_len;
  if (max_len > L) return 2;

  // 3) pack rows (parallel memcpy)
  PackCtx ctx{data, starts4, lens4, L, seq, qual, lengths, need_seq};
  parallel_for(n_records, n_threads, pack_body, &ctx);
  return 0;
}

struct AssembleCtx {
  const uint8_t* data;
  const int64_t* name_start;
  const int32_t* name_len;
  const int64_t* seq_start;
  const int64_t* comment_start;
  const int32_t* comment_len;
  const int64_t* qual_start;
  const int32_t* five;
  const int32_t* three;
  const uint8_t* n_mask;  // nullable
  int rewrite_comment;
  uint8_t lowq;
  const int64_t* out_offsets;
  uint8_t* out;
};

static void assemble_body(int64_t lo, int64_t hi, void* vctx) {
  AssembleCtx* c = static_cast<AssembleCtx*>(vctx);
  for (int64_t r = lo; r < hi; r++) {
    uint8_t* o = c->out + c->out_offsets[r];
    int32_t nl = c->name_len[r];
    memcpy(o, c->data + c->name_start[r], nl);
    o += nl;
    *o++ = '\n';
    bool nrec = c->n_mask && c->n_mask[r];
    if (nrec) {
      *o++ = 'N';
    } else {
      int32_t cut = c->three[r] - c->five[r];
      memcpy(o, c->data + c->seq_start[r] + c->five[r], cut);
      o += cut;
    }
    *o++ = '\n';
    if (c->rewrite_comment) {
      *o++ = '+';
    } else {
      int32_t cl = c->comment_len[r];
      memcpy(o, c->data + c->comment_start[r], cl);
      o += cl;
    }
    *o++ = '\n';
    if (nrec) {
      *o++ = c->lowq;
    } else {
      int32_t cut = c->three[r] - c->five[r];
      memcpy(o, c->data + c->qual_start[r] + c->five[r], cut);
      o += cut;
    }
    *o++ = '\n';
  }
}

// Emit trimmed records at precomputed output offsets (parallel memcpy).
// Record format per the reference writer (src/trim_single.cpp:390-396);
// rewrite_comment=1 emits upstream-1.33 bare '+'; n_mask rows become the
// pe -M replacement record (seq "N", quality = lowq).
void sk_assemble(const uint8_t* data, int64_t k, const int64_t* name_start,
                 const int32_t* name_len, const int64_t* seq_start,
                 const int64_t* comment_start, const int32_t* comment_len,
                 const int64_t* qual_start, const int32_t* five,
                 const int32_t* three, const uint8_t* n_mask,
                 int rewrite_comment, uint8_t lowq, const int64_t* out_offsets,
                 uint8_t* out, int n_threads) {
  AssembleCtx ctx{data,       name_start, name_len,       seq_start,
                  comment_start, comment_len, qual_start, five,
                  three,      n_mask,     rewrite_comment, lowq,
                  out_offsets, out};
  parallel_for(k, n_threads, assemble_body, &ctx);
}

// Decode gzip stream chunk? (gzip handled in Python via zlib for now.)

}  // extern "C"
