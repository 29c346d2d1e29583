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
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
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

// ------------------------------------------------------------- formatting
//
// Byte-exact C implementations of pybader_tpu.utils.python_format /
// fortran_format (the density-text writers; reference behaviour at
// /root/reference/pybader/utils.py:40-94).  The Python paths run at
// ~0.2-1 Mvalue/s, which makes a 512^3 CHGCAR write take minutes; these
// run two orders of magnitude faster and thread over row ranges.
//
//   mode 0: " %.{prec}E"  per value        (python_format, align "")
//   mode 1: " % .{prec}E" per value        (python_format, align " ":
//           positives get a sign-column space)
//   mode 2: fortran 'standard form': zero integer part, mantissa shifted
//           (" 0.DDDDE+XX" / " -.DDDDE+XX"), round-half-up mantissa with
//           the same log10/pow double arithmetic as the Python code.
//
// A '\n' terminates every ``cols`` values and any trailing partial row.

namespace {

void format_range(const double* vals, long lo, long hi, long n, int cols,
                  int mode, int prec, long row_len, std::string* out) {
    // std::to_chars (Ryu) is ~5-10x snprintf for doubles; its scientific
    // style matches printf %e (correctly rounded, >=2 exponent digits),
    // so uppercasing 'e' reproduces Python's :.{prec}E byte-for-byte —
    // asserted adversarially in tests/test_native_format.py.
    char tmp[64];
    out->reserve((hi - lo) * (prec + 10));
    for (long i = lo; i < hi; ++i) {
        double v = vals[i];
        if (mode == 2 && !std::isfinite(v)) {
            // the fortran-form log10/pow arithmetic is undefined on
            // nan/inf; emit the uppercased token like modes 0/1 do
            auto res = std::to_chars(tmp, tmp + sizeof tmp, v,
                                     std::chars_format::scientific, 1);
            out->push_back(' ');
            for (char* c = tmp; c < res.ptr; ++c)
                out->push_back(static_cast<char>(std::toupper(
                    static_cast<unsigned char>(*c))));
        } else if (mode == 2) {
            if (v == 0.0) {
                out->append(" 0.");
                out->append(prec, '0');
                out->append("E+00");
            } else {
                double av = std::fabs(v);
                long exp = static_cast<long>(
                    std::floor(std::log10(av))) + 1;
                double scaled = 0.5 + av / std::pow(10.0, static_cast<double>(
                    exp - prec));
                long value = static_cast<long>(scaled);
                auto ir = std::to_chars(tmp, tmp + sizeof tmp, value);
                int nd = static_cast<int>(ir.ptr - tmp);
                out->append(v < 0 ? " -." : " 0.");
                if (nd >= prec) {
                    out->append(tmp, prec);
                } else {
                    out->append(tmp, nd);
                    out->append(prec - nd, '0');
                }
                long ae = exp < 0 ? -exp : exp;
                out->push_back('E');
                out->push_back(exp < 0 ? '-' : '+');
                if (ae < 10) {
                    out->push_back('0');
                    out->push_back(static_cast<char>('0' + ae));
                } else {
                    auto er = std::to_chars(tmp, tmp + sizeof tmp, ae);
                    out->append(tmp, er.ptr - tmp);
                }
            }
        } else {
            out->push_back(' ');
            if (mode == 1 && !std::signbit(v)) out->push_back(' ');
            auto res = std::to_chars(tmp, tmp + sizeof tmp, v,
                                     std::chars_format::scientific, prec);
            if (std::isfinite(v)) {
                char* e = res.ptr - 1;
                while (e > tmp && *e != 'e') --e;
                *e = 'E';
            } else {
                // nan/inf have no exponent: uppercase the whole token
                // ("nan" -> "NAN", "-inf" -> "-INF"), matching Python's
                // :.{prec}E formatting of non-finite values
                for (char* c = tmp; c < res.ptr; ++c)
                    *c = static_cast<char>(std::toupper(
                        static_cast<unsigned char>(*c)));
            }
            out->append(tmp, res.ptr - tmp);
        }
        if (row_len > 0) {
            long r = i % row_len;
            if ((r + 1) % cols == 0 || r + 1 == row_len)
                out->push_back('\n');
        } else if ((i + 1) % cols == 0 || i + 1 == n) {
            out->push_back('\n');
        }
    }
}

}  // namespace

extern "C" {

// Format n doubles; returns bytes written into out (< 0 if out is too
// small — call again with a bigger buffer).  row_len > 0 treats the input
// as logical rows of that many values, each formatted independently
// (newline at every ``cols`` within a row and at the row end) — the cube
// writer's per-z-row structure.
long fp_format(const double* vals, long n, int cols, int mode, int prec,
               long row_len, char* out, long max_out, int n_threads) {
    if (n <= 0) return 0;
    if (cols < 1) cols = 1;
    if (row_len < 0 || (row_len > 0 && n % row_len != 0)) return -1;
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 64) n_threads = 64;
    if (n / cols < n_threads * 4) n_threads = 1;

    // split at line/row boundaries so the newline logic stays local
    long unit = row_len > 0 ? row_len : cols;
    long rows = (n + unit - 1) / unit;
    std::vector<long> bounds(n_threads + 1);
    for (int t = 0; t <= n_threads; ++t) {
        long r = (rows * t) / n_threads;
        bounds[t] = r * unit < n ? r * unit : n;
    }
    std::vector<std::string> parts(n_threads);
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) {
        threads.emplace_back(format_range, vals, bounds[t], bounds[t + 1],
                             n, cols, mode, prec, row_len, &parts[t]);
    }
    for (auto& th : threads) th.join();

    long total = 0;
    for (auto& s : parts) total += static_cast<long>(s.size());
    if (total > max_out) return -total;
    long off = 0;
    for (auto& s : parts) {
        memcpy(out + off, s.data(), s.size());
        off += static_cast<long>(s.size());
    }
    return total;
}

}  // extern "C"
