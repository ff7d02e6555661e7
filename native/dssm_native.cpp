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
#include <cstring>
#include <string>
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
  return PyTuple_Pack(2, idx_b, wgt_b);
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
  return PyTuple_Pack(3, idx_b, wgt_b, mask_b);
}

PyMethodDef kMethods[] = {
    {"hash_batch", py_hash_batch, METH_VARARGS,
     "hash_batch(texts, vocab_size, k, normalize) -> (idx_bytes, wgt_bytes)"},
    {"hash_batch_sequence", py_hash_batch_sequence, METH_VARARGS,
     "hash_batch_sequence(texts, vocab, t, kw, normalize) -> "
     "(idx_bytes, wgt_bytes, mask_bytes)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "dssm_native",
    "C++ letter-trigram hashing for the dssm_tpu input pipeline", -1,
    kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit_dssm_native(void) { return PyModule_Create(&kModule); }
