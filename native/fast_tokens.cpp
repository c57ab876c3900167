// femx native runtime: high-throughput numeric tokenizer for mesh ingest.
//
// The reference app's mesh I/O rides gmsh/meshio (C++ inside); femx's
// pure-Python .msh parser is correct but Python-tokenization-bound on large
// files. This translation unit provides the native fast path, exposed via
// ctypes (no pybind11 in this environment):
//
//   femx_parse_doubles: whitespace-separated ASCII numbers -> double array
//   femx_count_tokens:  token count for preallocation
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)
// Loader + fallback: femx/_native.py.

#include <cstdlib>
#include <cstring>
#include <cctype>

extern "C" {

// Count whitespace-separated tokens in text[0:len).
long femx_count_tokens(const char* text, long len) {
    long count = 0;
    bool in_tok = false;
    for (long i = 0; i < len; ++i) {
        const bool ws = std::isspace(static_cast<unsigned char>(text[i]));
        if (!ws && !in_tok) { ++count; in_tok = true; }
        else if (ws) { in_tok = false; }
    }
    return count;
}

// Parse up to max_out whitespace-separated numbers from text[0:len) into
// out. Returns the number parsed, or -1 on a malformed token.
long femx_parse_doubles(const char* text, long len, double* out, long max_out) {
    const char* p = text;
    const char* end = text + len;
    long n = 0;
    while (p < end && n < max_out) {
        while (p < end && std::isspace(static_cast<unsigned char>(*p))) ++p;
        if (p >= end) break;
        char* next = nullptr;
        const double v = std::strtod(p, &next);
        if (next == p) return -1;  // not a number
        out[n++] = v;
        p = next;
    }
    return n;
}

}  // extern "C"
