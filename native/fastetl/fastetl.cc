// fastetl: streaming MIMIC event-table aggregator.
//
// Native replacement for the reference ETL's hottest host loop
// (00_data.py:200-256 `load_and_aggregate_feature_data` over the ~270M-row
// CHARTEVENTS csv.gz, plus the 26M-row LABEVENTS scan at 00_data.py:173-197).
// pandas materializes the whole table before filtering; this streams the
// gzip-compressed CSV once, filters (cohort membership, itemid whitelist,
// 0..window h since ICU admission), bins into `bin_hours` intervals and
// aggregates (mean or sum) per (subject, hadm, bin, itemid) into a hash map
// — O(selected rows) memory instead of O(file).
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (fairmultimodal_tpu/data/native.py); no pybind11 dependency.
//
// Semantics matched to the reference (the pandas path in data/etl.py):
//   * events inner-merge against ALL ICU stays of their (subject, hadm) —
//     an admission with multiple stays duplicates each event once per stay,
//     with that stay's intime driving the window test and hour_bin
//     (etl.py:383-386 merges on (subject_id, hadm_id) without dedup)
//   * rows whose numeric field does not parse still CREATE their group
//     (pandas keeps the NaN row): NaN-skipping sum of an all-NaN group is
//     0.0, mean is NaN — reproduced at emission time
//   * the time window test is inclusive on both ends (pandas .between(0, 24))
//   * bin = floor(hours_since_admission / bin_hours)
//   * timestamp column = first of {charttime, starttime, storetime,
//     eventtime, endtime}; numeric column = first of {value, amount,
//     valuenum} (00_data.py:220-244)

#include <zlib.h>

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct AggKey {
  int64_t subj;
  int64_t hadm;
  int32_t bin;
  int64_t itemid;
  bool operator==(const AggKey& o) const {
    return subj == o.subj && hadm == o.hadm && bin == o.bin &&
           itemid == o.itemid;
  }
};

struct AggKeyHash {
  size_t operator()(const AggKey& k) const {
    uint64_t h = 1469598103934665603ull;
    auto mix = [&h](uint64_t v) {
      h ^= v;
      h *= 1099511628211ull;
    };
    mix((uint64_t)k.subj);
    mix((uint64_t)k.hadm);
    mix((uint64_t)(uint32_t)k.bin);
    mix((uint64_t)k.itemid);
    return (size_t)h;
  }
};

struct AggVal {
  double sum = 0.0;
  int64_t count = 0;
};

// "YYYY-MM-DD HH:MM:SS" (optionally with fractional seconds) -> epoch secs.
// Returns NaN on malformed input. Days-from-civil (Howard Hinnant algorithm).
double parse_timestamp(const char* s, size_t len) {
  if (len < 10) return NAN;
  auto digit = [](char c) { return c >= '0' && c <= '9'; };
  for (int i : {0, 1, 2, 3, 5, 6, 8, 9})
    if (!digit(s[i])) return NAN;
  if (s[4] != '-' || s[7] != '-') return NAN;
  int y = (s[0] - '0') * 1000 + (s[1] - '0') * 100 + (s[2] - '0') * 10 +
          (s[3] - '0');
  unsigned m = (s[5] - '0') * 10 + (s[6] - '0');
  unsigned d = (s[8] - '0') * 10 + (s[9] - '0');
  if (m < 1 || m > 12 || d < 1 || d > 31) return NAN;
  int hh = 0, mm = 0, ss = 0;
  if (len >= 19 && (s[10] == ' ' || s[10] == 'T')) {
    if (!(digit(s[11]) && digit(s[12]) && digit(s[14]) && digit(s[15]) &&
          digit(s[17]) && digit(s[18])))
      return NAN;
    hh = (s[11] - '0') * 10 + (s[12] - '0');
    mm = (s[14] - '0') * 10 + (s[15] - '0');
    ss = (s[17] - '0') * 10 + (s[18] - '0');
  }
  y -= m <= 2;
  const int era = (y >= 0 ? y : y - 399) / 400;
  const unsigned yoe = (unsigned)(y - era * 400);
  const unsigned doy = (153 * (m + (m > 2 ? -3 : 9)) + 2) / 5 + d - 1;
  const unsigned doe = yoe * 365 + yoe / 4 - yoe / 100 + doy;
  const int64_t days = (int64_t)era * 146097 + (int64_t)doe - 719468;
  return (double)(days * 86400 + hh * 3600 + mm * 60 + ss);
}

// Split one CSV line into fields (handles quoted fields with embedded
// commas/quotes; MIMIC event tables never embed newlines in these columns).
void split_csv(const std::string& line, std::vector<std::pair<size_t, size_t>>* out) {
  out->clear();
  size_t i = 0, n = line.size();
  while (i <= n) {
    size_t start, len;
    if (i < n && line[i] == '"') {
      ++i;
      start = i;
      std::string unq;  // rare path
      while (i < n) {
        if (line[i] == '"') {
          if (i + 1 < n && line[i + 1] == '"') {
            i += 2;
            continue;
          }
          break;
        }
        ++i;
      }
      len = i - start;
      if (i < n) ++i;        // closing quote
      if (i < n && line[i] == ',') ++i;
      out->emplace_back(start, len);
      if (i == n) break;
      continue;
    }
    start = i;
    while (i < n && line[i] != ',') ++i;
    len = i - start;
    out->emplace_back(start, len);
    if (i == n) break;
    ++i;
    if (i == n) {  // trailing comma -> final empty field
      out->emplace_back(i, 0);
      break;
    }
  }
}

bool parse_int(const char* s, size_t len, int64_t* out) {
  if (len == 0) return false;
  char buf[32];
  if (len >= sizeof(buf)) return false;
  memcpy(buf, s, len);
  buf[len] = 0;
  char* end = nullptr;
  double v = strtod(buf, &end);  // ids sometimes appear as "123.0"
  if (end == buf || !std::isfinite(v)) return false;
  *out = (int64_t)v;
  return true;
}

struct Handle {
  std::vector<int64_t> subj, hadm, itemid;
  std::vector<int32_t> bin;
  std::vector<double> value;
  std::string error;
  int64_t rows_scanned = 0;  // data lines read (throughput reporting)
};

void set_err(char* errbuf, int errlen, const std::string& msg) {
  if (errbuf && errlen > 0) {
    snprintf(errbuf, (size_t)errlen, "%s", msg.c_str());
  }
}

}  // namespace

extern "C" {

// Aggregate one event table. Returns an opaque handle (free with
// fastetl_free) or nullptr on error (message in errbuf).
//
//   path            csv or csv.gz file
//   stay_subj/hadm/intime_epoch[n_stays]
//                   cohort stays; rows joining (subject_id, hadm_id) to an
//                   ICU intime (epoch seconds)
//   itemids[n_itemids]
//                   whitelist; n_itemids == 0 disables the filter
//   window_hours    keep rows with 0 <= hours_since_admission <= window
//   bin_hours       bin width
//   agg_mode        0 = mean, 1 = sum
void* fastetl_aggregate(const char* path, const int64_t* stay_subj,
                        const int64_t* stay_hadm, const double* intime_epoch,
                        int64_t n_stays, const int64_t* itemids,
                        int64_t n_itemids, double window_hours,
                        double bin_hours, int agg_mode, char* errbuf,
                        int errlen) {
  gzFile f = gzopen(path, "rb");
  if (!f) {
    set_err(errbuf, errlen, std::string("cannot open ") + path);
    return nullptr;
  }
  gzbuffer(f, 1 << 20);

  // All intimes per (subject, hadm): an admission with multiple ICU stays
  // must process each event once per stay, like the pandas inner merge.
  std::unordered_map<uint64_t, std::vector<double>> stay_intime;
  stay_intime.reserve((size_t)n_stays * 2);
  for (int64_t i = 0; i < n_stays; ++i) {
    uint64_t key = ((uint64_t)(uint32_t)stay_subj[i] << 32) |
                   (uint32_t)stay_hadm[i];
    stay_intime[key].push_back(intime_epoch[i]);
  }
  std::unordered_map<int64_t, bool> item_ok;
  item_ok.reserve((size_t)n_itemids * 2);
  for (int64_t i = 0; i < n_itemids; ++i) item_ok.emplace(itemids[i], true);

  std::string line;
  line.reserve(1 << 16);
  char buf[1 << 16];
  auto read_line = [&](std::string* out) -> bool {
    out->clear();
    while (true) {
      if (gzgets(f, buf, sizeof(buf)) == nullptr) return !out->empty();
      out->append(buf);
      if (!out->empty() && out->back() == '\n') {
        out->pop_back();
        if (!out->empty() && out->back() == '\r') out->pop_back();
        return true;
      }
    }
  };

  if (!read_line(&line)) {
    gzclose(f);
    set_err(errbuf, errlen, "empty file");
    return nullptr;
  }
  std::vector<std::pair<size_t, size_t>> fields;
  split_csv(line, &fields);
  int col_subj = -1, col_hadm = -1, col_item = -1, col_time = -1,
      col_value = -1;
  {
    static const char* kTimeCols[] = {"charttime", "starttime", "storetime",
                                      "eventtime", "endtime"};
    static const char* kValueCols[] = {"value", "amount", "valuenum"};
    int time_rank = 99, value_rank = 99;
    for (size_t c = 0; c < fields.size(); ++c) {
      std::string name = line.substr(fields[c].first, fields[c].second);
      for (auto& ch : name) ch = (char)tolower((unsigned char)ch);
      if (name == "subject_id") col_subj = (int)c;
      if (name == "hadm_id") col_hadm = (int)c;
      if (name == "itemid") col_item = (int)c;
      for (int r = 0; r < 5; ++r)
        if (name == kTimeCols[r] && r < time_rank) {
          time_rank = r;
          col_time = (int)c;
        }
      for (int r = 0; r < 3; ++r)
        if (name == kValueCols[r] && r < value_rank) {
          value_rank = r;
          col_value = (int)c;
        }
    }
  }
  if (col_subj < 0 || col_hadm < 0 || col_time < 0 || col_value < 0) {
    gzclose(f);
    set_err(errbuf, errlen,
            "missing required column (need subject_id, hadm_id, a timestamp "
            "and a numeric column)");
    return nullptr;
  }

  std::unordered_map<AggKey, AggVal, AggKeyHash> agg;
  const double window_secs = window_hours * 3600.0;
  const double bin_secs = bin_hours * 3600.0;
  int64_t rows_scanned = 0;

  while (read_line(&line)) {
    if (line.empty()) continue;
    ++rows_scanned;
    split_csv(line, &fields);
    int needed = col_subj;
    needed = std::max(needed, col_hadm);
    needed = std::max(needed, col_time);
    needed = std::max(needed, col_value);
    if (col_item >= 0) needed = std::max(needed, col_item);
    if ((int)fields.size() <= needed) continue;

    int64_t subj, hadm;
    if (!parse_int(line.data() + fields[col_subj].first,
                   fields[col_subj].second, &subj))
      continue;
    if (!parse_int(line.data() + fields[col_hadm].first,
                   fields[col_hadm].second, &hadm))
      continue;
    uint64_t skey = ((uint64_t)(uint32_t)subj << 32) | (uint32_t)hadm;
    auto it = stay_intime.find(skey);
    if (it == stay_intime.end()) continue;

    int64_t item = 0;
    if (col_item >= 0) {
      if (!parse_int(line.data() + fields[col_item].first,
                     fields[col_item].second, &item))
        continue;
      if (n_itemids > 0 && item_ok.find(item) == item_ok.end()) continue;
    }

    double t = parse_timestamp(line.data() + fields[col_time].first,
                               fields[col_time].second);
    if (!std::isfinite(t)) continue;

    // Parse the numeric field once; an unparseable value (pandas NaN after
    // to_numeric(errors="coerce")) still creates its group below so the
    // emitted aggregate matches pandas' NaN-skipping sum (0.0) / mean (NaN).
    bool has_v = false;
    double v = 0.0;
    {
      char vbuf[64];
      size_t vlen = fields[col_value].second;
      if (vlen > 0 && vlen < sizeof(vbuf)) {
        memcpy(vbuf, line.data() + fields[col_value].first, vlen);
        vbuf[vlen] = 0;
        char* end = nullptr;
        double parsed = strtod(vbuf, &end);
        if (end != vbuf && *end == 0 && std::isfinite(parsed)) {
          has_v = true;
          v = parsed;
        }
      }
    }

    // One aggregation per stay whose window admits the event (the pandas
    // merge duplicates the row per stay; different intimes give different
    // hour bins and, for sum tables, genuinely double-counted values).
    for (double intime : it->second) {
      double dt = t - intime;
      if (dt < 0.0 || dt > window_secs) continue;
      AggKey key{subj, hadm, (int32_t)(dt / bin_secs), item};
      AggVal& a = agg[key];
      if (has_v) {
        a.sum += v;
        a.count += 1;
      }
    }
  }
  gzclose(f);

  Handle* h = new Handle();
  h->rows_scanned = rows_scanned;
  size_t n = agg.size();
  h->subj.reserve(n);
  h->hadm.reserve(n);
  h->bin.reserve(n);
  h->itemid.reserve(n);
  h->value.reserve(n);
  for (const auto& kv : agg) {
    h->subj.push_back(kv.first.subj);
    h->hadm.push_back(kv.first.hadm);
    h->bin.push_back(kv.first.bin);
    h->itemid.push_back(kv.first.itemid);
    // pandas parity for all-NaN groups: sum -> 0.0, mean -> NaN.
    h->value.push_back(
        agg_mode == 1
            ? kv.second.sum
            : (kv.second.count > 0
                   ? kv.second.sum / (double)kv.second.count
                   : std::numeric_limits<double>::quiet_NaN()));
  }
  return h;
}

int64_t fastetl_size(void* handle) {
  return (int64_t)((Handle*)handle)->subj.size();
}

int64_t fastetl_rows_scanned(void* handle) {
  return ((Handle*)handle)->rows_scanned;
}

void fastetl_fill(void* handle, int64_t* subj, int64_t* hadm, int32_t* bin,
                  int64_t* itemid, double* value) {
  Handle* h = (Handle*)handle;
  size_t n = h->subj.size();
  memcpy(subj, h->subj.data(), n * sizeof(int64_t));
  memcpy(hadm, h->hadm.data(), n * sizeof(int64_t));
  memcpy(bin, h->bin.data(), n * sizeof(int32_t));
  memcpy(itemid, h->itemid.data(), n * sizeof(int64_t));
  memcpy(value, h->value.data(), n * sizeof(double));
}

void fastetl_free(void* handle) { delete (Handle*)handle; }

}  // extern "C"
