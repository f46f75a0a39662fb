// Prompt-lookup speculative drafting — native core.
//
// Exact policy twin of quantizedattention_tpu/serve/spec.py:propose_lookup
// (the Python implementation is the differential-test oracle, the
// serve/scheduler.py convention): propose up to k continuation tokens for a
// token history by matching its longest trailing n-gram (n = max_ngram down
// to min_ngram) against earlier occurrences; the MOST RECENT earlier match
// wins, overlapping matches allowed (periodic text extends itself).
//
// Why native: the proposer runs on the serving host's critical path — once
// per slot per speculative dispatch, scanning the slot's whole history
// (prompt + generation). The Python loop is O(len * ngram) with interpreter
// overhead per comparison; this is the same scan in C++ (the engine's
// host-time ledger is the motivation — host milliseconds are tokens).
//
// C ABI only (loaded via ctypes; this repo does not use pybind11).

#include <cstdint>

extern "C" {

// hist: the token history (prompt + generated), length n.
// out:  caller-allocated buffer of at least k int32s.
// Returns the number of proposed tokens (0 when nothing matches).
int32_t qa_propose_lookup(const int32_t* hist, int32_t n, int32_t k,
                          int32_t max_ngram, int32_t min_ngram,
                          int32_t* out) {
    if (min_ngram < 1) min_ngram = 1;  // clamp, matching the Python twin
    if (k < 1 || n < min_ngram + 1) return 0;
    int32_t top = max_ngram < n - 1 ? max_ngram : n - 1;
    for (int32_t ng = top; ng >= min_ngram; --ng) {
        const int32_t* suffix = hist + n - ng;
        // scan right-to-left over earlier windows (recency bias)
        for (int32_t i = n - ng - 1; i >= 0; --i) {
            bool match = true;
            for (int32_t j = 0; j < ng; ++j) {
                if (hist[i + j] != suffix[j]) { match = false; break; }
            }
            if (!match) continue;
            int32_t cnt = 0;
            for (int32_t p = i + ng; p < n && cnt < k; ++p) out[cnt++] = hist[p];
            if (cnt > 0) return cnt;
        }
    }
    return 0;
}

}  // extern "C"
