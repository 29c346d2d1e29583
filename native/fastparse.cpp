// Fast multithreaded whitespace-separated float parser.
//
// The hot path of CHGCAR/cube reading is converting ~10^8 ASCII floats to
// doubles.  The reference does this through numpy string parsing on one
// thread; here we split the buffer at token boundaries and parse chunks in
// parallel with strtod (exact, locale-independent for the C locale).
//
// Exposed C ABI (used from Python via ctypes, see pybader_tpu/io/_fastparse.py):
//   long fp_parse(const char* buf, long len, double* out, long max_out,
//                 int n_threads);
// returns the number of values written (< 0 on error).

#include <cctype>
#include <charconv>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

inline bool is_space(char c) {
    return c == ' ' || c == '\n' || c == '\t' || c == '\r' || c == '\f' ||
           c == '\v';
}

// Parse every token in [begin, end) into vals; returns count.
// std::from_chars is ~5x strtod and locale-independent; exact per IEEE-754
// round-to-nearest, matching python float() / numpy parsing bit-for-bit.
long parse_range(const char* begin, const char* end, std::vector<double>* vals) {
    const char* p = begin;
    while (p < end) {
        while (p < end && is_space(*p)) ++p;
        if (p >= end) break;
        double v;
        auto res = std::from_chars(p, end, v);
        if (res.ec != std::errc()) {  // unparseable token: skip it
            while (p < end && !is_space(*p)) ++p;
            continue;
        }
        vals->push_back(v);
        p = res.ptr;
    }
    return static_cast<long>(vals->size());
}

}  // namespace

extern "C" {

long fp_parse(const char* buf, long len, double* out, long max_out,
              int n_threads) {
    if (len <= 0 || max_out <= 0) return 0;
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 64) n_threads = 64;
    long approx = len / n_threads;
    if (approx < (1 << 16)) n_threads = 1;  // small input: no thread overhead

    // chunk boundaries snapped to whitespace so no token is split
    std::vector<const char*> starts(n_threads + 1);
    starts[0] = buf;
    starts[n_threads] = buf + len;
    for (int t = 1; t < n_threads; ++t) {
        const char* p = buf + (len * t) / n_threads;
        const char* end = buf + len;
        while (p < end && !is_space(*p)) ++p;
        starts[t] = p;
    }

    std::vector<std::vector<double>> results(n_threads);
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) {
        results[t].reserve((starts[t + 1] - starts[t]) / 12 + 16);
        threads.emplace_back(parse_range, starts[t], starts[t + 1],
                             &results[t]);
    }
    for (auto& th : threads) th.join();

    long total = 0;
    for (int t = 0; t < n_threads; ++t) {
        long n = static_cast<long>(results[t].size());
        if (total + n > max_out) n = max_out - total;
        if (n > 0) {
            memcpy(out + total, results[t].data(), n * sizeof(double));
            total += n;
        }
        if (total >= max_out) break;
    }
    return total;
}

}  // extern "C"
