// Fast DNA tokenization kernels (C shared library, bound via ctypes).
//
// The input pipeline's host-side hot loop is per-example DNA tokenization of
// kilobase-scale strings (reference pushes this through HF Python tokenizers,
// SURVEY §3.1 "CPU hot loop"). These kernels do the greedy longest-match
// k-mer scan (NT-v2 semantics, see bioreason_tpu/data/nt_tokenizer.py) and
// byte tokenization (Evo2 semantics) in C with batch padding, writing
// directly into caller-provided int32 buffers (numpy arrays).
//
// Vocabulary contract (matches KmerTokenizer's default layout):
//   0..5   specials (<unk> <pad> <mask> <cls> <eos> <bos>)
//   6..4101  all 4^6 ACGT 6-mers, first char most significant
//   4102..4106  single chars A C G T N

#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

constexpr int32_t kPad = 1;
constexpr int32_t kCls = 3;
constexpr int32_t kKmerBase = 6;
constexpr int32_t kCharBase = 6 + 4096;  // A C G T N

inline int base_code(char c) {
  switch (c) {
    case 'A': return 0;
    case 'C': return 1;
    case 'G': return 2;
    case 'T': return 3;
    default: return -1;
  }
}

inline int32_t char_token(char c) {
  switch (c) {
    case 'A': return kCharBase + 0;
    case 'C': return kCharBase + 1;
    case 'G': return kCharBase + 2;
    case 'T': return kCharBase + 3;
    case 'N': return kCharBase + 4;
    default: return 0;  // <unk>
  }
}

}  // namespace

extern "C" {

// Greedy longest-match 6-mer tokenization of one sequence.
// Returns the number of tokens written (<= max_tokens).
int32_t nt_tokenize(const char* seq, int64_t seq_len, int32_t* out,
                    int32_t max_tokens, int32_t prepend_cls) {
  int32_t n = 0;
  if (prepend_cls && n < max_tokens) out[n++] = kCls;
  int64_t i = 0;
  while (i < seq_len && n < max_tokens) {
    if (i + 6 <= seq_len) {
      int32_t code = 0;
      bool ok = true;
      for (int p = 0; p < 6; ++p) {
        int c = base_code(seq[i + p]);
        if (c < 0) { ok = false; break; }
        code = code * 4 + c;
      }
      if (ok) {
        out[n++] = kKmerBase + code;
        i += 6;
        continue;
      }
    }
    out[n++] = char_token(seq[i]);
    ++i;
  }
  return n;
}

// Batch tokenize + pad into [batch, width] int32 buffers.
// seqs: concatenated bytes; offsets: batch+1 prefix offsets.
// Returns the max (unpadded, possibly truncated) token count.
int32_t nt_tokenize_batch(const char* seqs, const int64_t* offsets,
                          int32_t batch, int32_t* ids, int32_t* mask,
                          int32_t width, int32_t max_tokens,
                          int32_t prepend_cls, int32_t pad_left) {
  int32_t longest = 0;
  for (int32_t b = 0; b < batch; ++b) {
    const char* seq = seqs + offsets[b];
    int64_t len = offsets[b + 1] - offsets[b];
    int32_t* row = ids + static_cast<int64_t>(b) * width;
    int32_t* mrow = mask + static_cast<int64_t>(b) * width;
    for (int32_t j = 0; j < width; ++j) { row[j] = kPad; mrow[j] = 0; }

    int32_t tmp_cap = std::min<int32_t>(max_tokens, width);
    int32_t n = nt_tokenize(seq, len, row, tmp_cap, prepend_cls);
    longest = std::max(longest, n);
    if (pad_left && n < width) {
      std::memmove(row + (width - n), row, sizeof(int32_t) * n);
      for (int32_t j = 0; j < width - n; ++j) row[j] = kPad;
      for (int32_t j = width - n; j < width; ++j) mrow[j] = 1;
    } else {
      for (int32_t j = 0; j < n; ++j) mrow[j] = 1;
      for (int32_t j = n; j < width; ++j) row[j] = kPad;
    }
  }
  return longest;
}

// Count tokens without writing (used to size batch buffers exactly).
int32_t nt_count_tokens(const char* seq, int64_t seq_len, int32_t max_tokens,
                        int32_t prepend_cls) {
  int32_t n = prepend_cls ? 1 : 0;
  int64_t i = 0;
  while (i < seq_len && n < max_tokens) {
    if (i + 6 <= seq_len) {
      bool ok = true;
      for (int p = 0; p < 6; ++p) {
        if (base_code(seq[i + p]) < 0) { ok = false; break; }
      }
      if (ok) { ++n; i += 6; continue; }
    }
    ++n; ++i;
  }
  return n;
}

// Byte/char tokenization batch (Evo2 semantics: id == byte, left padding).
int32_t char_tokenize_batch(const char* seqs, const int64_t* offsets,
                            int32_t batch, int32_t* ids, int32_t* mask,
                            int32_t width, int32_t max_tokens, int32_t pad_id,
                            int32_t pad_left) {
  int32_t longest = 0;
  for (int32_t b = 0; b < batch; ++b) {
    const char* seq = seqs + offsets[b];
    int64_t len = offsets[b + 1] - offsets[b];
    int32_t n = static_cast<int32_t>(std::min<int64_t>(
        len, std::min<int32_t>(max_tokens, width)));
    longest = std::max(longest, n);
    int32_t* row = ids + static_cast<int64_t>(b) * width;
    int32_t* mrow = mask + static_cast<int64_t>(b) * width;
    int32_t start = pad_left ? width - n : 0;
    for (int32_t j = 0; j < width; ++j) { row[j] = pad_id; mrow[j] = 0; }
    for (int32_t j = 0; j < n; ++j) {
      row[start + j] = static_cast<uint8_t>(seq[j]);
      mrow[start + j] = 1;
    }
  }
  return longest;
}

}  // extern "C"
