// fastnotes: native note cleaning + whitespace-token chunking for the ETL's
// unstructured hot loop.
//
// Reimplements, byte-for-byte on ASCII input, the per-patient text pipeline of
// data/etl.py::build_unstructured (reference 00_data.py:395-439):
//
//   t = text.replace("\n", " ").replace("\r", " ").strip().lower()
//   t = clean_note_text(t)          # seven sequential re.sub passes
//   chunks = split_text_to_chunks(t, 512)
//
// The Python path runs these via pandas .apply over ~36k concatenated
// patient-note blobs (tens of kB each on real MIMIC) — regex passes at
// Python-re speed plus a per-row pd.Series construction.  This library scans
// bytes instead.  The Python wrapper (data/native.py::clean_and_chunk_native)
// only routes ASCII documents here (MIMIC notes are ASCII; Python str.lower/
// str.strip/str.split are unicode-aware, so any non-ASCII doc falls back to
// the pandas path to keep exactness), and tests fuzz the two paths against
// each other (tests/test_native.py).
//
// Regex pass semantics replicated (sequential, left-to-right, non-overlapping
// — exactly Python re.sub):
//   1. \[(.*?)\]          at '[': drop through the NEXT ']' if one exists,
//                         else the '[' is literal (no match at that position).
//   2. [0-9]+\.           maximal digit run immediately followed by '.'
//                         (a shorter sub-run can never be followed by '.',
//                         so the maximal-run scan is exact).
//   3. dr\.      -> "doctor"
//   4. m\.d\.    -> "md"
//   5. "admission date:" -> ""
//   6. "discharge date:" -> ""
//   7. --|__|==  -> ""    ("---" drops the first two chars, keeps "-").
//
// Chunking: tokens are maximal runs of non-whitespace (Python str.split());
// each group of chunk_size tokens is re-joined with single spaces.  The
// output buffer holds every chunk of every doc back to back; chunk_offsets
// delimit them and doc_chunk_counts says how many belong to each doc.

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

inline bool is_ws(unsigned char c) {
  // Python str.split()/str.strip() whitespace, restricted to ASCII:
  // space, \t, \n, \v, \f, \r, plus the C1 separators \x1c-\x1f (FS, GS,
  // RS, US) — Unicode White_Space includes them, so Python treats them as
  // whitespace while they still pass str.isascii(); omitting them would
  // silently diverge chunk boundaries from the pandas oracle.
  return c == ' ' || (c >= '\t' && c <= '\r') ||
         (c >= '\x1c' && c <= '\x1f');
}

inline bool is_digit(unsigned char c) { return c >= '0' && c <= '9'; }

inline char to_lower(unsigned char c) {
  return (c >= 'A' && c <= 'Z') ? (char)(c + 32) : (char)c;
}

// Pass 0: \n,\r -> ' '; strip; tolower.
std::string normalize(const char* p, int64_t n) {
  std::string s(p, p + n);
  for (char& c : s) {
    if (c == '\n' || c == '\r') c = ' ';
  }
  size_t b = 0, e = s.size();
  while (b < e && is_ws((unsigned char)s[b])) ++b;
  while (e > b && is_ws((unsigned char)s[e - 1])) --e;
  std::string out;
  out.reserve(e - b);
  for (size_t i = b; i < e; ++i) out.push_back(to_lower((unsigned char)s[i]));
  return out;
}

std::string pass_brackets(const std::string& s) {
  std::string out;
  out.reserve(s.size());
  size_t i = 0, n = s.size();
  while (i < n) {
    const char* open = (const char*)std::memchr(s.data() + i, '[', n - i);
    if (!open) {
      out.append(s, i, n - i);
      break;
    }
    const size_t oi = (size_t)(open - s.data());
    out.append(s, i, oi - i);
    const char* close =
        (const char*)std::memchr(s.data() + oi + 1, ']', n - oi - 1);
    if (!close) {
      // no closing ']' anywhere after: every remaining char is literal
      out.append(s, oi, n - oi);
      break;
    }
    i = (size_t)(close - s.data()) + 1;  // drop "[...]" inclusive
  }
  return out;
}

std::string pass_digits_dot(const std::string& s) {
  std::string out;
  out.reserve(s.size());
  size_t i = 0, n = s.size();
  while (i < n) {
    size_t j = i;  // bulk-copy the non-digit span
    while (j < n && !is_digit((unsigned char)s[j])) ++j;
    out.append(s, i, j - i);
    if (j == n) break;
    size_t k = j;
    while (k < n && is_digit((unsigned char)s[k])) ++k;
    if (k < n && s[k] == '.') {
      i = k + 1;  // drop digits + '.'
    } else {
      out.append(s, j, k - j);
      i = k;
    }
  }
  return out;
}

std::string pass_literal(const std::string& s, const char* pat,
                         const char* repl) {
  const size_t pn = std::strlen(pat), rn = std::strlen(repl);
  std::string out;
  out.reserve(s.size());
  size_t i = 0, n = s.size();
  while (i < n) {
    const char* hit = (const char*)std::memchr(s.data() + i, pat[0], n - i);
    if (!hit) {
      out.append(s, i, n - i);
      break;
    }
    const size_t hi = (size_t)(hit - s.data());
    out.append(s, i, hi - i);
    if (hi + pn <= n && std::memcmp(s.data() + hi, pat, pn) == 0) {
      out.append(repl, rn);
      i = hi + pn;
    } else {
      out.push_back(s[hi]);
      i = hi + 1;
    }
  }
  return out;
}

inline bool is_pair_char(char c) { return c == '-' || c == '_' || c == '='; }

std::string pass_pairs(const std::string& s) {
  std::string out;
  out.reserve(s.size());
  size_t i = 0, n = s.size();
  while (i < n) {
    size_t j = i;  // bulk-copy the span with no pair-capable chars
    while (j < n && !is_pair_char(s[j])) ++j;
    out.append(s, i, j - i);
    if (j == n) break;
    if (j + 1 < n && s[j + 1] == s[j]) {
      i = j + 2;  // drop the pair
    } else {
      out.push_back(s[j]);
      i = j + 1;
    }
  }
  return out;
}

std::string clean_doc(const char* p, int64_t n) {
  std::string s = normalize(p, n);
  s = pass_brackets(s);
  s = pass_digits_dot(s);
  s = pass_literal(s, "dr.", "doctor");
  s = pass_literal(s, "m.d.", "md");
  s = pass_literal(s, "admission date:", "");
  s = pass_literal(s, "discharge date:", "");
  s = pass_pairs(s);
  return s;
}

struct Result {
  std::string buf;                    // all chunks, back to back
  std::vector<int64_t> chunk_offsets; // n_chunks + 1 entries into buf
  std::vector<int32_t> doc_counts;    // chunks per doc
  std::string clean_buf;              // cleaned full doc texts, back to back
  std::vector<int64_t> doc_offsets;   // n_docs + 1 entries into clean_buf
};

}  // namespace

extern "C" {

void* fastnotes_clean(const char* buf, const int64_t* offsets, int64_t n_docs,
                      int32_t chunk_size, char* err, int n_err) {
  if (chunk_size <= 0) {
    if (err && n_err > 0) std::snprintf(err, n_err, "chunk_size must be > 0");
    return nullptr;
  }
  auto* r = new Result();
  const int64_t total_in = n_docs > 0 ? offsets[n_docs] : 0;
  r->buf.reserve((size_t)total_in);        // chunks never exceed input+growth
  r->clean_buf.reserve((size_t)total_in);  // hints only; strings still grow
  r->chunk_offsets.push_back(0);
  r->doc_offsets.push_back(0);
  r->doc_counts.reserve(n_docs);
  std::vector<std::pair<size_t, size_t>> tokens;  // (start, len) in cleaned
  for (int64_t d = 0; d < n_docs; ++d) {
    const std::string cleaned =
        clean_doc(buf + offsets[d], offsets[d + 1] - offsets[d]);
    r->clean_buf.append(cleaned);
    r->doc_offsets.push_back((int64_t)r->clean_buf.size());
    tokens.clear();
    size_t i = 0, n = cleaned.size();
    while (i < n) {
      while (i < n && is_ws((unsigned char)cleaned[i])) ++i;
      size_t start = i;
      while (i < n && !is_ws((unsigned char)cleaned[i])) ++i;
      if (i > start) tokens.emplace_back(start, i - start);
    }
    int32_t n_chunks = 0;
    for (size_t t = 0; t < tokens.size(); t += chunk_size) {
      const size_t stop = std::min(tokens.size(), t + (size_t)chunk_size);
      for (size_t k = t; k < stop; ++k) {
        if (k > t) r->buf.push_back(' ');
        r->buf.append(cleaned, tokens[k].first, tokens[k].second);
      }
      r->chunk_offsets.push_back((int64_t)r->buf.size());
      ++n_chunks;
    }
    r->doc_counts.push_back(n_chunks);
  }
  return r;
}

int64_t fastnotes_buf_size(void* h) {
  return (int64_t)static_cast<Result*>(h)->buf.size();
}

int64_t fastnotes_n_chunks(void* h) {
  return (int64_t)static_cast<Result*>(h)->chunk_offsets.size() - 1;
}

int64_t fastnotes_clean_buf_size(void* h) {
  return (int64_t)static_cast<Result*>(h)->clean_buf.size();
}

void fastnotes_fill(void* h, char* out_buf, int64_t* chunk_offsets,
                    int32_t* doc_counts, char* clean_out,
                    int64_t* doc_offsets) {
  auto* r = static_cast<Result*>(h);
  std::memcpy(out_buf, r->buf.data(), r->buf.size());
  std::memcpy(chunk_offsets, r->chunk_offsets.data(),
              r->chunk_offsets.size() * sizeof(int64_t));
  std::memcpy(doc_counts, r->doc_counts.data(),
              r->doc_counts.size() * sizeof(int32_t));
  std::memcpy(clean_out, r->clean_buf.data(), r->clean_buf.size());
  std::memcpy(doc_offsets, r->doc_offsets.data(),
              r->doc_offsets.size() * sizeof(int64_t));
}

void fastnotes_free(void* h) { delete static_cast<Result*>(h); }

}  // extern "C"
