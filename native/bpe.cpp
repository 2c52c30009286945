// Byte-level BPE core — native tokenizer engine.
//
// Replaces the Rust HF-tokenizers path the reference uses everywhere through
// WhisperTokenizerFast (run_pseudo_labelling.py:220-222,
// run_data_filtering.py:138-141; SURVEY.md §2.2). Decode of pseudo-labels is
// a hot path over tens of millions of utterances, so both directions are
// C++. The Python layer (kotoba_whisper_tpu/tokenizer) owns the regex
// pre-tokenization split, special-token handling, and vocab file parsing; it
// hands this engine:
//   - a vocab blob: id -> raw byte string (offsets + bytes),
//   - merge rules: (left_id, right_id) -> (rank, merged_id).
// Encoding merges a pre-split word (sequence of byte-token ids) greedily by
// lowest merge rank — exact GPT-2/Whisper BPE semantics.
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
  size_t operator()(const std::pair<int32_t, int32_t>& p) const {
    return (static_cast<uint64_t>(static_cast<uint32_t>(p.first)) << 32) ^
           static_cast<uint32_t>(p.second);
  }
};

struct Bpe {
  std::vector<std::string> id_to_bytes;
  std::unordered_map<std::string, int32_t> bytes_to_id;
  // (l, r) -> {rank, merged_id}
  std::unordered_map<std::pair<int32_t, int32_t>, std::pair<int32_t, int32_t>,
                     PairHash>
      merges;
  int32_t byte_id[256];  // id of each single-byte token (-1 if absent)
};

}  // namespace

extern "C" {

void* kwt_bpe_new(const uint8_t* vocab_bytes, const int64_t* vocab_offsets,
                  int32_t n_tokens, const int32_t* merge_rows,
                  int32_t n_merges) {
  auto* b = new Bpe();
  b->id_to_bytes.reserve(n_tokens);
  for (int32_t i = 0; i < n_tokens; ++i) {
    const uint8_t* start = vocab_bytes + vocab_offsets[i];
    size_t len = static_cast<size_t>(vocab_offsets[i + 1] - vocab_offsets[i]);
    b->id_to_bytes.emplace_back(reinterpret_cast<const char*>(start), len);
    b->bytes_to_id.emplace(b->id_to_bytes.back(), i);
  }
  for (int i = 0; i < 256; ++i) b->byte_id[i] = -1;
  for (int i = 0; i < 256; ++i) {
    std::string s(1, static_cast<char>(i));
    auto it = b->bytes_to_id.find(s);
    if (it != b->bytes_to_id.end()) b->byte_id[i] = it->second;
  }
  // merge_rows: n_merges x 3 of (left_id, right_id, merged_id); row index
  // is the rank.
  for (int32_t r = 0; r < n_merges; ++r) {
    int32_t l = merge_rows[3 * r], rr = merge_rows[3 * r + 1],
            m = merge_rows[3 * r + 2];
    b->merges.emplace(std::make_pair(l, rr), std::make_pair(r, m));
  }
  return b;
}

void kwt_bpe_free(void* h) { delete static_cast<Bpe*>(h); }

// Encode one pre-tokenized word (raw utf-8 bytes) to BPE ids.
// Returns number of ids written, or -1 on overflow / unknown byte.
int32_t kwt_bpe_encode_word(void* h, const uint8_t* word, int32_t n,
                            int32_t* out, int32_t max_out) {
  auto* b = static_cast<Bpe*>(h);
  std::vector<int32_t> sym;
  sym.reserve(n);
  for (int32_t i = 0; i < n; ++i) {
    int32_t id = b->byte_id[word[i]];
    if (id < 0) return -1;
    sym.push_back(id);
  }
  // Greedy lowest-rank merging. Words are short (regex pre-split), so the
  // O(len^2) scan beats heap bookkeeping in practice.
  while (sym.size() >= 2) {
    int32_t best_rank = INT32_MAX, best_pos = -1, best_merged = -1;
    for (size_t i = 0; i + 1 < sym.size(); ++i) {
      auto it = b->merges.find(std::make_pair(sym[i], sym[i + 1]));
      if (it != b->merges.end() && it->second.first < best_rank) {
        best_rank = it->second.first;
        best_pos = static_cast<int32_t>(i);
        best_merged = it->second.second;
      }
    }
    if (best_pos < 0) break;
    sym[best_pos] = best_merged;
    sym.erase(sym.begin() + best_pos + 1);
  }
  if (static_cast<int32_t>(sym.size()) > max_out) return -1;
  std::memcpy(out, sym.data(), sym.size() * sizeof(int32_t));
  return static_cast<int32_t>(sym.size());
}

// Decode ids to raw bytes. Unknown/special ids (>= vocab size or < 0) are
// skipped — the Python layer routes specials before calling. Returns bytes
// written or -1 on overflow.
int64_t kwt_bpe_decode(void* h, const int32_t* ids, int64_t n, uint8_t* out,
                       int64_t max_out) {
  auto* b = static_cast<Bpe*>(h);
  int64_t w = 0;
  const int32_t vocab = static_cast<int32_t>(b->id_to_bytes.size());
  for (int64_t i = 0; i < n; ++i) {
    int32_t id = ids[i];
    if (id < 0 || id >= vocab) continue;
    const std::string& s = b->id_to_bytes[id];
    if (w + static_cast<int64_t>(s.size()) > max_out) return -1;
    std::memcpy(out + w, s.data(), s.size());
    w += s.size();
  }
  return w;
}

int32_t kwt_bpe_vocab_size(void* h) {
  return static_cast<int32_t>(static_cast<Bpe*>(h)->id_to_bytes.size());
}

int32_t kwt_bpe_token_to_id(void* h, const uint8_t* bytes, int32_t n) {
  auto* b = static_cast<Bpe*>(h);
  auto it = b->bytes_to_id.find(
      std::string(reinterpret_cast<const char*>(bytes), n));
  return it == b->bytes_to_id.end() ? -1 : it->second;
}

}  // extern "C"
