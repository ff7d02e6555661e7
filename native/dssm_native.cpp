// dssm_native — C++ host data-plane for the input pipeline.
//
// The reference leans on TensorFlow's C++ input ops for its data path; this
// module is the equivalent first-party native component: the letter-trigram
// hashing hot loop (tokenize -> bracket -> trigram -> FNV-1a -> top-K),
// bit-exact with the Python implementation in dssm_tpu/data/trigram.py
// (tests/test_native.py asserts exact parity). Pure CPython C API — no
// pybind11 in this environment.
//
// Exposed:
//   hash_batch(texts, vocab_size, k, normalize) -> (idx int32 [N,K], wgt f32 [N,K])
//   hash_batch_sequence(texts, vocab_size, t, kw, normalize)
//       -> (idx int32 [N,T,Kw], wgt f32 [N,T,Kw], mask f32 [N,T])

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr uint64_t kFnvOffset = 0xCBF29CE484222325ULL;
constexpr uint64_t kFnvPrime = 0x100000001B3ULL;

inline uint64_t fnv1a(const char* s, size_t n) {
  uint64_t h = kFnvOffset;
  for (size_t i = 0; i < n; ++i) {
    h ^= static_cast<uint8_t>(s[i]);
    h *= kFnvPrime;
  }
  return h;
}

inline bool word_char(unsigned char c) {
  return (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '\'';
}

// Tokenize like Python's re.findall(r"[a-z0-9']+", text.lower()).
// ASCII lowercasing matches str.lower() for ASCII; non-ASCII bytes are
// non-word chars under the regex either way (it only matches [a-z0-9']).
void tokenize(const char* text, size_t len, std::vector<std::string>* words) {
  std::string cur;
  for (size_t i = 0; i < len; ++i) {
    unsigned char c = static_cast<unsigned char>(text[i]);
    if (c >= 'A' && c <= 'Z') c = c - 'A' + 'a';
    if (word_char(c)) {
      cur.push_back(static_cast<char>(c));
    } else if (!cur.empty()) {
      words->push_back(cur);
      cur.clear();
    }
  }
  if (!cur.empty()) words->push_back(cur);
}

inline int32_t trigram_id(const char* tri, size_t n, int64_t vocab) {
  return static_cast<int32_t>(1 + fnv1a(tri, n) % (vocab - 1));
}

// counts for one word's trigrams, accumulated into `counts`.
void word_trigram_counts(const std::string& w, int64_t vocab,
                         std::unordered_map<int32_t, float>* counts) {
  std::string b;
  b.reserve(w.size() + 2);
  b.push_back('#');
  b += w;
  b.push_back('#');
  if (b.size() < 3) {
    (*counts)[trigram_id(b.data(), b.size(), vocab)] += 1.0f;
    return;
  }
  for (size_t i = 0; i + 3 <= b.size(); ++i) {
    (*counts)[trigram_id(b.data() + i, 3, vocab)] += 1.0f;
  }
}

// Top-k by (count desc, index asc) — matches the Python
// sorted(items, key=lambda kv: (-kv[1], kv[0]))[:k].
void counts_to_fixed(const std::unordered_map<int32_t, float>& counts, int k,
                     bool normalize, int32_t* idx_out, float* wgt_out) {
  std::vector<std::pair<int32_t, float>> items(counts.begin(), counts.end());
  std::sort(items.begin(), items.end(),
            [](const auto& a, const auto& b) {
              if (a.second != b.second) return a.second > b.second;
              return a.first < b.first;
            });
  int n = std::min<int>(k, static_cast<int>(items.size()));
  for (int j = 0; j < n; ++j) {
    idx_out[j] = items[j].first;
    wgt_out[j] = items[j].second;
  }
  for (int j = n; j < k; ++j) {
    idx_out[j] = 0;
    wgt_out[j] = 0.0f;
  }
  if (normalize) {
    double ss = 0.0;
    for (int j = 0; j < k; ++j) ss += double(wgt_out[j]) * wgt_out[j];
    float norm = static_cast<float>(std::sqrt(ss));
    if (norm > 0.0f) {
      for (int j = 0; j < k; ++j) wgt_out[j] /= norm;
    }
  }
}

struct TextRef {
  const char* data;
  Py_ssize_t len;
};

bool collect_texts(PyObject* seq_in, std::vector<TextRef>* out,
                   PyObject** holder) {
  PyObject* seq = PySequence_Fast(seq_in, "texts must be a sequence");
  if (!seq) return false;
  *holder = seq;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  out->reserve(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PySequence_Fast_GET_ITEM(seq, i);
    Py_ssize_t len = 0;
    const char* s = PyUnicode_AsUTF8AndSize(item, &len);
    if (!s) return false;
    out->push_back({s, len});
  }
  return true;
}

PyObject* make_bytes_result(const void* data, size_t nbytes) {
  return PyBytes_FromStringAndSize(static_cast<const char*>(data),
                                   static_cast<Py_ssize_t>(nbytes));
}

// hash_batch(texts, vocab_size, k, normalize) -> (bytes idx, bytes wgt)
// The Python wrapper (dssm_tpu/data/native.py) wraps the bytes in numpy
// arrays — keeps this module free of a compile-time numpy dependency.
PyObject* py_hash_batch(PyObject*, PyObject* args) {
  PyObject* texts_obj;
  long long vocab;
  int k;
  int normalize;
  if (!PyArg_ParseTuple(args, "OLip", &texts_obj, &vocab, &k, &normalize)) {
    return nullptr;
  }
  std::vector<TextRef> texts;
  PyObject* holder = nullptr;
  if (!collect_texts(texts_obj, &texts, &holder)) {
    Py_XDECREF(holder);
    return nullptr;
  }
  size_t n = texts.size();
  std::vector<int32_t> idx(n * k);
  std::vector<float> wgt(n * k);
  {
    // No Python API below — release the GIL so prefetch threads overlap.
    Py_BEGIN_ALLOW_THREADS;
    std::vector<std::string> words;
    std::unordered_map<int32_t, float> counts;
    for (size_t i = 0; i < n; ++i) {
      words.clear();
      counts.clear();
      tokenize(texts[i].data, static_cast<size_t>(texts[i].len), &words);
      for (const auto& w : words) word_trigram_counts(w, vocab, &counts);
      counts_to_fixed(counts, k, normalize != 0, idx.data() + i * k,
                      wgt.data() + i * k);
    }
    Py_END_ALLOW_THREADS;
  }
  Py_DECREF(holder);
  PyObject* idx_b = make_bytes_result(idx.data(), idx.size() * 4);
  PyObject* wgt_b = make_bytes_result(wgt.data(), wgt.size() * 4);
  if (!idx_b || !wgt_b) {
    Py_XDECREF(idx_b);
    Py_XDECREF(wgt_b);
    return nullptr;
  }
  // PyTuple_Pack takes NEW references; drop ours or the bytes leak.
  PyObject* out = PyTuple_Pack(2, idx_b, wgt_b);
  Py_DECREF(idx_b);
  Py_DECREF(wgt_b);
  return out;
}

// hash_batch_sequence(texts, vocab, t, kw, normalize)
//   -> (bytes idx [N*T*Kw], bytes wgt, bytes mask [N*T])
PyObject* py_hash_batch_sequence(PyObject*, PyObject* args) {
  PyObject* texts_obj;
  long long vocab;
  int t, kw;
  int normalize;
  if (!PyArg_ParseTuple(args, "OLiip", &texts_obj, &vocab, &t, &kw,
                        &normalize)) {
    return nullptr;
  }
  std::vector<TextRef> texts;
  PyObject* holder = nullptr;
  if (!collect_texts(texts_obj, &texts, &holder)) {
    Py_XDECREF(holder);
    return nullptr;
  }
  size_t n = texts.size();
  std::vector<int32_t> idx(n * t * kw, 0);
  std::vector<float> wgt(n * t * kw, 0.0f);
  std::vector<float> mask(n * t, 0.0f);
  {
    Py_BEGIN_ALLOW_THREADS;
    std::vector<std::string> words;
    std::unordered_map<int32_t, float> counts;
    for (size_t i = 0; i < n; ++i) {
      words.clear();
      tokenize(texts[i].data, static_cast<size_t>(texts[i].len), &words);
      size_t nw = std::min<size_t>(words.size(), static_cast<size_t>(t));
      for (size_t wi = 0; wi < nw; ++wi) {
        counts.clear();
        word_trigram_counts(words[wi], vocab, &counts);
        counts_to_fixed(counts, kw, normalize != 0,
                        idx.data() + (i * t + wi) * kw,
                        wgt.data() + (i * t + wi) * kw);
        mask[i * t + wi] = 1.0f;
      }
    }
    Py_END_ALLOW_THREADS;
  }
  Py_DECREF(holder);
  PyObject* idx_b = make_bytes_result(idx.data(), idx.size() * 4);
  PyObject* wgt_b = make_bytes_result(wgt.data(), wgt.size() * 4);
  PyObject* mask_b = make_bytes_result(mask.data(), mask.size() * 4);
  if (!idx_b || !wgt_b || !mask_b) {
    Py_XDECREF(idx_b);
    Py_XDECREF(wgt_b);
    Py_XDECREF(mask_b);
    return nullptr;
  }
  PyObject* out = PyTuple_Pack(3, idx_b, wgt_b, mask_b);
  Py_DECREF(idx_b);
  Py_DECREF(wgt_b);
  Py_DECREF(mask_b);
  return out;
}

// ---------------------------------------------------------------------------
// Two-level batch dedupe (bit-exact with dssm_tpu/kernels/dedup_embed.py's
// dedupe_two_level — tests/test_native.py asserts parity).
//
// The per-batch host dedupe is the other hot loop of the input pipeline: at
// the multihost preset's global batch (65,536 x 64 indices x 2 sides) the
// numpy path is ~4M-element sorts per side per step on one thread.  Here:
// hash-map counting + one sort over the UNIQUE ids only (~1-100k, not ~4M),
// GIL released so the prefetch thread overlaps device steps.

constexpr int32_t kSkipSentinelGid = 1 << 25;  // dedup_embed.SKIP_SENTINEL_GID

// Select the ids to keep under a cap: by (count desc, id asc), result sorted
// by id asc. Matches numpy argsort(-counts, stable)[:cap] over ids that were
// sorted ascending (rank order == id order), then keep.sort(). nth_element
// picks the same SET as a full sort under the same total order (ids are
// distinct, so the order is total) in O(n) instead of O(n log n) — at Zipf
// multihost batches the overflow set is ~1M unique rows and the full sort
// was the single largest host cost (measured).
void top_by_count(std::vector<std::pair<int32_t, int64_t>>* id_counts,
                  size_t cap, std::vector<int32_t>* kept_sorted) {
  auto cmp = [](const std::pair<int32_t, int64_t>& a,
                const std::pair<int32_t, int64_t>& b) {
    if (a.second != b.second) return a.second > b.second;
    return a.first < b.first;
  };
  size_t n = std::min(cap, id_counts->size());
  if (id_counts->size() > cap) {
    std::nth_element(id_counts->begin(), id_counts->begin() + cap,
                     id_counts->end(), cmp);
  }
  kept_sorted->resize(n);
  for (size_t j = 0; j < n; ++j) (*kept_sorted)[j] = (*id_counts)[j].first;
  std::sort(kept_sorted->begin(), kept_sorted->end());
}

// Host-thread pool sizing: DSSM_DEDUPE_THREADS env overrides; default is the
// hardware concurrency (production hosts have 100+ vCPUs feeding one chip —
// the whole point of parallelizing the per-step global-batch dedupe).
unsigned dedupe_threads(size_t n) {
  if (n < (1u << 17)) return 1;  // small batches: thread spawn not worth it
  const char* e = std::getenv("DSSM_DEDUPE_THREADS");
  unsigned t = e ? static_cast<unsigned>(std::atoi(e))
                 : std::thread::hardware_concurrency();
  if (t < 1) t = 1;
  return std::min(t, 64u);
}

// Run fn(tid, begin, end) over [0, n) split into `nt` contiguous chunks.
template <typename F>
void parallel_for(size_t n, unsigned nt, F&& fn) {
  if (nt <= 1 || n < nt) {
    fn(0u, size_t{0}, n);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(nt - 1);
  size_t chunk = (n + nt - 1) / nt;
  for (unsigned t = 1; t < nt; ++t) {
    size_t lo = t * chunk, hi = std::min(n, (t + 1) * chunk);
    if (lo >= hi) break;
    threads.emplace_back([&fn, t, lo, hi] { fn(t, lo, hi); });
  }
  fn(0u, size_t{0}, std::min(n, chunk));
  for (auto& th : threads) th.join();
}

// Two-level dedupe core over one or two index spans (the joint entry passes
// q and d separately — no 33 MB host concat per step). Deterministic and
// bit-exact with the numpy path regardless of thread count: histograms merge
// by integer addition, selection happens on the merged arrays, and the
// per-entry passes write disjoint ranges.
void dedupe_core(const int32_t* a, size_t na, const int32_t* b, size_t nb,
                 size_t g_cap, int64_t g_cap_rows, int64_t u2_cap,
                 int32_t grp, int32_t* uniq_groups, int32_t* row_sel,
                 int32_t* inv2, float* keep) {
  const size_t n = na + nb;
  int shift = 0;
  while ((1 << shift) < grp) ++shift;
  const int32_t mask = grp - 1;
  const unsigned nt = dedupe_threads(n);
  auto span_at = [&](size_t i) { return i < na ? a[i] : b[i - na]; };

  // Pass A: max gid (parallel max-reduce), then per-group histogram with
  // per-thread dense arrays merged by addition.
  std::vector<int32_t> tmax(nt, 0);
  parallel_for(n, nt, [&](unsigned t, size_t lo, size_t hi) {
    int32_t m = 0;
    for (size_t i = lo; i < hi; ++i) {
      const int32_t g = span_at(i) >> shift;
      if (g > m) m = g;
    }
    tmax[t] = m;
  });
  int32_t max_gid = 0;
  for (unsigned t = 0; t < nt; ++t) max_gid = std::max(max_gid, tmax[t]);
  const size_t gspan = static_cast<size_t>(max_gid) + 1;

  std::vector<std::vector<int64_t>> gcounts(nt);
  parallel_for(n, nt, [&](unsigned t, size_t lo, size_t hi) {
    auto& gc = gcounts[t];
    gc.assign(gspan, 0);
    for (size_t i = lo; i < hi; ++i) ++gc[span_at(i) >> shift];
  });
  std::vector<int64_t>& gcount = gcounts[0];
  parallel_for(gspan, nt, [&](unsigned, size_t lo, size_t hi) {
    for (unsigned t = 1; t < nt; ++t) {
      const auto& gc = gcounts[t];
      for (size_t g = lo; g < hi; ++g) gcount[g] += gc[g];
    }
  });

  // Level 1 selection: top g_cap groups by (count desc, gid asc).
  std::vector<int32_t> kept_g;
  size_t n_gids = 0;
  for (size_t g = 0; g < gspan; ++g) n_gids += (gcount[g] != 0);
  if (n_gids > g_cap) {
    std::vector<std::pair<int32_t, int64_t>> items;
    items.reserve(n_gids);
    for (size_t g = 0; g < gspan; ++g) {
      if (gcount[g]) items.push_back({static_cast<int32_t>(g), gcount[g]});
    }
    top_by_count(&items, g_cap, &kept_g);
  } else {
    kept_g.reserve(n_gids);
    for (size_t g = 0; g < gspan; ++g) {
      if (gcount[g]) kept_g.push_back(static_cast<int32_t>(g));
    }
  }
  std::vector<int32_t> grank(gspan, -1);  // gid -> compact group slot
  for (size_t j = 0; j < kept_g.size(); ++j) {
    grank[kept_g[j]] = static_cast<int32_t>(j);
    uniq_groups[j] = kept_g[j];
  }

  // Pass B: level-1 inverse (compact ROW id per lookup) + level-2 row
  // histogram, per-thread rcounts merged. Scratch reused across calls
  // (thread_local on the CALLING thread): zero-filling fresh 33 MB pages
  // per call costs more than the passes that use them.
  thread_local std::vector<int32_t> inv1;
  thread_local std::vector<uint8_t> keep1;
  if (inv1.size() < n) inv1.resize(n);
  if (keep1.size() < n) keep1.resize(n);
  int32_t* inv1p = inv1.data();
  uint8_t* keep1p = keep1.data();
  std::vector<std::vector<int64_t>> rcounts(nt);
  parallel_for(n, nt, [&](unsigned t, size_t lo, size_t hi) {
    auto& rc = rcounts[t];
    rc.assign(static_cast<size_t>(g_cap_rows), 0);
    for (size_t i = lo; i < hi; ++i) {
      const int32_t v = span_at(i);
      const int32_t gid = v >> shift;
      const int32_t off = v & mask;
      const int32_t r = grank[gid];
      if (r < 0) {  // dropped (overflow): numpy maps the slot to 0
        inv1p[i] = off;
        keep1p[i] = 0;
      } else {
        inv1p[i] = r * grp + off;
        keep1p[i] = 1;
        ++rc[inv1p[i]];
      }
    }
  });
  std::vector<int64_t>& rcount = rcounts[0];
  parallel_for(static_cast<size_t>(g_cap_rows), nt,
               [&](unsigned, size_t lo, size_t hi) {
    for (unsigned t = 1; t < nt; ++t) {
      const auto& rc = rcounts[t];
      for (size_t r = lo; r < hi; ++r) rcount[r] += rc[r];
    }
  });

  // Level 2 selection: top u2_cap unique rows by (count desc, row asc).
  std::vector<int32_t> kept_r;
  size_t n_rows = 0;
  for (size_t r = 0; r < rcount.size(); ++r) n_rows += (rcount[r] != 0);
  if (n_rows > static_cast<size_t>(u2_cap)) {
    std::vector<std::pair<int32_t, int64_t>> items;
    items.reserve(n_rows);
    for (size_t r = 0; r < rcount.size(); ++r) {
      if (rcount[r]) items.push_back({static_cast<int32_t>(r), rcount[r]});
    }
    top_by_count(&items, static_cast<size_t>(u2_cap), &kept_r);
  } else {
    kept_r.reserve(n_rows);
    for (size_t r = 0; r < rcount.size(); ++r) {
      if (rcount[r]) kept_r.push_back(static_cast<int32_t>(r));
    }
  }
  std::vector<int32_t> rslot(static_cast<size_t>(g_cap_rows), -1);
  for (size_t j = 0; j < kept_r.size(); ++j) {
    rslot[kept_r[j]] = static_cast<int32_t>(j);
    row_sel[j] = kept_r[j];
  }

  // Pass C: final slot per lookup (disjoint writes — fully parallel).
  parallel_for(n, nt, [&](unsigned, size_t lo, size_t hi) {
    for (size_t i = lo; i < hi; ++i) {
      const int32_t s = keep1p[i] ? rslot[inv1p[i]] : -1;
      inv2[i] = s < 0 ? 0 : s;
      keep[i] = s < 0 ? 0.0f : 1.0f;
    }
  });
}

// dedupe_two_level(idx_bytes, n, g_cap_rows, u2_cap, group)
//   -> (uniq_groups_bytes [g_cap_rows/group] i32, row_sel_bytes [u2_cap] i32,
//       inv2_bytes [n] i32, keep_bytes [n] f32)
PyObject* py_dedupe_two_level(PyObject*, PyObject* args) {
  Py_buffer idx_buf;
  long long g_cap_rows, u2_cap, group;
  if (!PyArg_ParseTuple(args, "y*LLL", &idx_buf, &g_cap_rows, &u2_cap,
                        &group)) {
    return nullptr;
  }
  if (group <= 0 || g_cap_rows % group != 0) {
    PyBuffer_Release(&idx_buf);
    PyErr_SetString(PyExc_ValueError, "g_cap_rows not divisible by group");
    return nullptr;
  }
  if ((group & (group - 1)) != 0) {
    PyBuffer_Release(&idx_buf);
    PyErr_SetString(PyExc_ValueError, "group must be a power of two");
    return nullptr;
  }
  const size_t n = static_cast<size_t>(idx_buf.len) / sizeof(int32_t);
  const int32_t* idx = static_cast<const int32_t*>(idx_buf.buf);
  const size_t g_cap = static_cast<size_t>(g_cap_rows / group);

  // Outputs are written straight into the result PyBytes buffers: at the
  // multihost batch (8.4M indices) the extra vector->bytes copies — and the
  // kernel page faults of zero-filling fresh 33MB vectors — cost more than
  // all the dedupe compute combined (measured ~400ms vs ~60ms).
  std::vector<int32_t> uniq_groups(g_cap, kSkipSentinelGid);
  std::vector<int32_t> row_sel(static_cast<size_t>(u2_cap), 0);
  PyObject* inv_obj = PyBytes_FromStringAndSize(nullptr,
                                                static_cast<Py_ssize_t>(n * 4));
  PyObject* keep_obj = PyBytes_FromStringAndSize(
      nullptr, static_cast<Py_ssize_t>(n * 4));
  if (!inv_obj || !keep_obj) {
    Py_XDECREF(inv_obj);
    Py_XDECREF(keep_obj);
    PyBuffer_Release(&idx_buf);
    return nullptr;
  }
  int32_t* inv2 = reinterpret_cast<int32_t*>(PyBytes_AS_STRING(inv_obj));
  float* keep = reinterpret_cast<float*>(PyBytes_AS_STRING(keep_obj));
  {
    Py_BEGIN_ALLOW_THREADS;
    dedupe_core(idx, n, nullptr, 0, g_cap, g_cap_rows, u2_cap,
                static_cast<int32_t>(group), uniq_groups.data(),
                row_sel.data(), inv2, keep);
    Py_END_ALLOW_THREADS;
  }
  PyBuffer_Release(&idx_buf);
  PyObject* uniq_b = make_bytes_result(uniq_groups.data(),
                                       uniq_groups.size() * 4);
  PyObject* sel_b = make_bytes_result(row_sel.data(), row_sel.size() * 4);
  if (!uniq_b || !sel_b) {
    Py_XDECREF(uniq_b);
    Py_XDECREF(sel_b);
    Py_DECREF(inv_obj);
    Py_DECREF(keep_obj);
    return nullptr;
  }
  PyObject* out = PyTuple_Pack(4, uniq_b, sel_b, inv_obj, keep_obj);
  Py_DECREF(uniq_b);
  Py_DECREF(sel_b);
  Py_DECREF(inv_obj);
  Py_DECREF(keep_obj);
  return out;
}

// dedupe_two_level_joint(q_bytes, d_bytes, g_cap_rows, u2_cap, group)
//   -> (uniq_bytes, row_sel_bytes, inv2_bytes [nq+nd] i32, keep_bytes).
// The union dedupe over BOTH towers' indices without the per-step host
// concat (q first in inv/keep order — matches np.concatenate([q, d])).
PyObject* py_dedupe_two_level_joint(PyObject*, PyObject* args) {
  Py_buffer q_buf, d_buf;
  long long g_cap_rows, u2_cap, group;
  if (!PyArg_ParseTuple(args, "y*y*LLL", &q_buf, &d_buf, &g_cap_rows,
                        &u2_cap, &group)) {
    return nullptr;
  }
  if (group <= 0 || g_cap_rows % group != 0 ||
      (group & (group - 1)) != 0) {
    PyBuffer_Release(&q_buf);
    PyBuffer_Release(&d_buf);
    PyErr_SetString(PyExc_ValueError, "bad group / g_cap_rows");
    return nullptr;
  }
  const size_t nq = static_cast<size_t>(q_buf.len) / sizeof(int32_t);
  const size_t nd = static_cast<size_t>(d_buf.len) / sizeof(int32_t);
  const size_t n = nq + nd;
  const size_t g_cap = static_cast<size_t>(g_cap_rows / group);
  std::vector<int32_t> uniq_groups(g_cap, kSkipSentinelGid);
  std::vector<int32_t> row_sel(static_cast<size_t>(u2_cap), 0);
  PyObject* inv_obj = PyBytes_FromStringAndSize(
      nullptr, static_cast<Py_ssize_t>(n * 4));
  PyObject* keep_obj = PyBytes_FromStringAndSize(
      nullptr, static_cast<Py_ssize_t>(n * 4));
  if (!inv_obj || !keep_obj) {
    Py_XDECREF(inv_obj);
    Py_XDECREF(keep_obj);
    PyBuffer_Release(&q_buf);
    PyBuffer_Release(&d_buf);
    return nullptr;
  }
  int32_t* inv2 = reinterpret_cast<int32_t*>(PyBytes_AS_STRING(inv_obj));
  float* keep = reinterpret_cast<float*>(PyBytes_AS_STRING(keep_obj));
  {
    Py_BEGIN_ALLOW_THREADS;
    dedupe_core(static_cast<const int32_t*>(q_buf.buf), nq,
                static_cast<const int32_t*>(d_buf.buf), nd, g_cap,
                g_cap_rows, u2_cap, static_cast<int32_t>(group),
                uniq_groups.data(), row_sel.data(), inv2, keep);
    Py_END_ALLOW_THREADS;
  }
  PyBuffer_Release(&q_buf);
  PyBuffer_Release(&d_buf);
  PyObject* uniq_b = make_bytes_result(uniq_groups.data(),
                                       uniq_groups.size() * 4);
  PyObject* sel_b = make_bytes_result(row_sel.data(), row_sel.size() * 4);
  if (!uniq_b || !sel_b) {
    Py_XDECREF(uniq_b);
    Py_XDECREF(sel_b);
    Py_DECREF(inv_obj);
    Py_DECREF(keep_obj);
    return nullptr;
  }
  PyObject* out = PyTuple_Pack(4, uniq_b, sel_b, inv_obj, keep_obj);
  Py_DECREF(uniq_b);
  Py_DECREF(sel_b);
  Py_DECREF(inv_obj);
  Py_DECREF(keep_obj);
  return out;
}

PyMethodDef kMethods[] = {
    {"hash_batch", py_hash_batch, METH_VARARGS,
     "hash_batch(texts, vocab_size, k, normalize) -> (idx_bytes, wgt_bytes)"},
    {"hash_batch_sequence", py_hash_batch_sequence, METH_VARARGS,
     "hash_batch_sequence(texts, vocab, t, kw, normalize) -> "
     "(idx_bytes, wgt_bytes, mask_bytes)"},
    {"dedupe_two_level", py_dedupe_two_level, METH_VARARGS,
     "dedupe_two_level(idx_bytes, g_cap_rows, u2_cap, group) -> "
     "(uniq_bytes, row_sel_bytes, inv2_bytes, keep_bytes)"},
    {"dedupe_two_level_joint", py_dedupe_two_level_joint, METH_VARARGS,
     "dedupe_two_level_joint(q_bytes, d_bytes, g_cap_rows, u2_cap, group) "
     "-> (uniq_bytes, row_sel_bytes, inv2_bytes, keep_bytes)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "dssm_native",
    "C++ letter-trigram hashing for the dssm_tpu input pipeline", -1,
    kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit_dssm_native(void) { return PyModule_Create(&kModule); }
