// Batched Levenshtein edit distance — native core for WER/CER metrics.
//
// TPU-native replacement for the jiwer/RapidFuzz C++ path the reference
// reaches through evaluate.load("wer"/"cer") (run_data_filtering.py:137,171;
// run_short_form_eval.py:219-224). WER filtering runs over millions of
// utterances (SURVEY.md §2.2), so the DP loop is C++ with a thread pool;
// Python passes packed uint32 symbol arrays (codepoints for CER, word ids
// for WER) with offset tables.
#include <algorithm>
#include <atomic>
#include <cstdint>
#include <thread>
#include <vector>

extern "C" {

// Single-pair Levenshtein distance over uint32 symbols.
int64_t kwt_levenshtein(const uint32_t* a, int64_t n, const uint32_t* b,
                        int64_t m) {
  if (n == 0) return m;
  if (m == 0) return n;
  // Keep the shorter sequence as the row for O(min(n,m)) memory.
  if (m > n) {
    std::swap(a, b);
    std::swap(n, m);
  }
  std::vector<int64_t> row(m + 1);
  for (int64_t j = 0; j <= m; ++j) row[j] = j;
  for (int64_t i = 1; i <= n; ++i) {
    int64_t prev = row[0];  // DP[i-1][j-1]
    row[0] = i;
    for (int64_t j = 1; j <= m; ++j) {
      int64_t cur = row[j];
      int64_t cost = (a[i - 1] == b[j - 1]) ? 0 : 1;
      row[j] = std::min({row[j] + 1, row[j - 1] + 1, prev + cost});
      prev = cur;
    }
  }
  return row[m];
}

// Batched: sequences packed into flat arrays with offsets (len = n_pairs+1).
// Writes per-pair distance and reference length (for corpus-level WER =
// sum(dist)/sum(ref_len)). Parallel over pairs.
void kwt_levenshtein_batch(const uint32_t* hyp, const int64_t* hyp_off,
                           const uint32_t* ref, const int64_t* ref_off,
                           int64_t n_pairs, int64_t* out_dist,
                           int64_t* out_ref_len, int32_t n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= n_pairs) break;
      const uint32_t* h = hyp + hyp_off[i];
      const uint32_t* r = ref + ref_off[i];
      int64_t hn = hyp_off[i + 1] - hyp_off[i];
      int64_t rn = ref_off[i + 1] - ref_off[i];
      out_dist[i] = kwt_levenshtein(h, hn, r, rn);
      out_ref_len[i] = rn;
    }
  };
  std::vector<std::thread> pool;
  for (int32_t t = 1; t < n_threads; ++t) pool.emplace_back(worker);
  worker();
  for (auto& t : pool) t.join();
}

}  // extern "C"
