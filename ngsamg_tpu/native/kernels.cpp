// Native (C++) setup kernels for ngsamg_tpu.
//
// The reference implements its entire setup pipeline natively
// (/root/reference/src/, ~67k LoC C++17); this module provides compiled
// equivalents of the host-side graph kernels that dominate the TPU-native
// framework's setup phase, exposed through the raw CPython C API (no
// pybind11 in the image):
//
//   * greedy_color   — sequential greedy graph coloring (fewer colors and
//                      ~10x faster than the vectorized speculative rounds;
//                      color count = sequential depth of the GS sweep)
//   * handshake_match— one full pairwise-matching round (propose/accept
//                      loop of coarsen/pairwise.py) in one pass
//   * ell_slots      — CSR -> padded-ELL slot computation
//
// Build: python setup.py build_ext --inplace   (see repo setup.py)
// Python callers fall back to the numpy implementations when this module
// is not built.

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

// ---------------------------------------------------------------------
// greedy_color(indptr int64[n+1], indices int64[nnz]) -> int32[n]
// ---------------------------------------------------------------------
PyObject *greedy_color(PyObject *, PyObject *args) {
  PyArrayObject *indptr_o, *indices_o;
  if (!PyArg_ParseTuple(args, "O!O!", &PyArray_Type, &indptr_o,
                        &PyArray_Type, &indices_o))
    return nullptr;
  auto *indptr = static_cast<const int64_t *>(PyArray_DATA(indptr_o));
  auto *indices = static_cast<const int64_t *>(PyArray_DATA(indices_o));
  const npy_intp n = PyArray_DIM(indptr_o, 0) - 1;

  npy_intp dims[1] = {n};
  PyArrayObject *out =
      (PyArrayObject *)PyArray_SimpleNew(1, dims, NPY_INT32);
  auto *colors = static_cast<int32_t *>(PyArray_DATA(out));
  std::fill(colors, colors + n, -1);

  std::vector<int32_t> mark(256, -1);
  int maxc = 0;
  for (int64_t v = 0; v < n; ++v) {
    for (int64_t k = indptr[v]; k < indptr[v + 1]; ++k) {
      const int64_t nb = indices[k];
      const int32_t c = colors[nb];
      if (c >= 0) mark[c] = (int32_t)v;
    }
    int32_t c = 0;
    while (c < (int32_t)mark.size() && mark[c] == (int32_t)v) ++c;
    colors[v] = c;
    if (c > maxc) maxc = c;
  }
  (void)maxc;
  return (PyObject *)out;
}

// ---------------------------------------------------------------------
// handshake_match(indptr, indices, weights f64, can_match uint8,
//                 theta f64, iters int)
//   -> partner int64[n]  (-1 unmatched)
// Vertices with can_match == 0 never propose and are never proposed to.
// ---------------------------------------------------------------------
PyObject *handshake_match(PyObject *, PyObject *args) {
  PyArrayObject *indptr_o, *indices_o, *w_o, *cm_o;
  double theta;
  int iters;
  if (!PyArg_ParseTuple(args, "O!O!O!O!di", &PyArray_Type, &indptr_o,
                        &PyArray_Type, &indices_o, &PyArray_Type, &w_o,
                        &PyArray_Type, &cm_o, &theta, &iters))
    return nullptr;
  auto *indptr = static_cast<const int64_t *>(PyArray_DATA(indptr_o));
  auto *indices = static_cast<const int64_t *>(PyArray_DATA(indices_o));
  auto *w = static_cast<const double *>(PyArray_DATA(w_o));
  auto *cm = static_cast<const uint8_t *>(PyArray_DATA(cm_o));
  const npy_intp n = PyArray_DIM(indptr_o, 0) - 1;

  npy_intp dims[1] = {n};
  PyArrayObject *out =
      (PyArrayObject *)PyArray_SimpleNew(1, dims, NPY_INT64);
  auto *partner = static_cast<int64_t *>(PyArray_DATA(out));
  std::fill(partner, partner + n, (int64_t)-1);

  // row maxima for the strength threshold
  std::vector<double> rowmax(n, 0.0);
  for (int64_t v = 0; v < n; ++v)
    for (int64_t k = indptr[v]; k < indptr[v + 1]; ++k)
      rowmax[v] = std::max(rowmax[v], w[k]);

  std::vector<int64_t> best(n);
  for (int it = 0; it < iters; ++it) {
    bool any = false;
    // propose: strongest available neighbor above threshold
    for (int64_t v = 0; v < n; ++v) {
      best[v] = -1;
      if (partner[v] >= 0 || !cm[v]) continue;
      double bw = -1.0;
      for (int64_t k = indptr[v]; k < indptr[v + 1]; ++k) {
        const int64_t nb = indices[k];
        if (partner[nb] >= 0 || !cm[nb]) continue;
        const double thr =
            theta * std::min(rowmax[v], rowmax[nb]);
        if (w[k] < thr || w[k] <= 0.0) continue;
        if (w[k] > bw) { bw = w[k]; best[v] = nb; }
      }
    }
    // accept mutual proposals
    for (int64_t v = 0; v < n; ++v) {
      const int64_t b = best[v];
      if (b > v && best[b] == v) {
        partner[v] = b;
        partner[b] = v;
        any = true;
      }
    }
    if (!any) break;
  }
  return (PyObject *)out;
}

// ---------------------------------------------------------------------
// ell_slots(indptr int64[n+1]) -> (rows int64[nnz], slot int64[nnz], K)
// ---------------------------------------------------------------------
PyObject *ell_slots(PyObject *, PyObject *args) {
  PyArrayObject *indptr_o;
  if (!PyArg_ParseTuple(args, "O!", &PyArray_Type, &indptr_o))
    return nullptr;
  auto *indptr = static_cast<const int64_t *>(PyArray_DATA(indptr_o));
  const npy_intp n = PyArray_DIM(indptr_o, 0) - 1;
  const int64_t nnz = indptr[n];

  npy_intp dims[1] = {nnz};
  PyArrayObject *rows_o =
      (PyArrayObject *)PyArray_SimpleNew(1, dims, NPY_INT64);
  PyArrayObject *slot_o =
      (PyArrayObject *)PyArray_SimpleNew(1, dims, NPY_INT64);
  auto *rows = static_cast<int64_t *>(PyArray_DATA(rows_o));
  auto *slot = static_cast<int64_t *>(PyArray_DATA(slot_o));
  int64_t K = 0;
  for (int64_t v = 0; v < n; ++v) {
    const int64_t deg = indptr[v + 1] - indptr[v];
    if (deg > K) K = deg;
    for (int64_t k = indptr[v]; k < indptr[v + 1]; ++k) {
      rows[k] = v;
      slot[k] = k - indptr[v];
    }
  }
  PyObject *ret = Py_BuildValue("(NNl)", rows_o, slot_o, (long)K);
  return ret;
}

// ---------------------------------------------------------------------
// rap_csr(A_indptr, A_indices, A_data, P_indptr, P_indices, P_data, nc)
//   -> (C_indptr, C_indices, C_data)   with C = P^T A P  (scalar CSR)
//
// Fused two-pass Gustavson with a dense sparse-accumulator (SPA) per row
// — the native Galerkin triple product of the reference
// (utils_sparseMM.hpp:94-108 RestrictMatrix), serving the generic
// (unstructured / block-energy) setup path; structured levels use the
// stencil-domain RAP instead (transfer/stencil.py).
// ---------------------------------------------------------------------
PyObject *rap_csr(PyObject *, PyObject *args) {
  PyArrayObject *ai_o, *aj_o, *av_o, *pi_o, *pj_o, *pv_o;
  long nc_l;
  if (!PyArg_ParseTuple(args, "O!O!O!O!O!O!l", &PyArray_Type, &ai_o,
                        &PyArray_Type, &aj_o, &PyArray_Type, &av_o,
                        &PyArray_Type, &pi_o, &PyArray_Type, &pj_o,
                        &PyArray_Type, &pv_o, &nc_l))
    return nullptr;
  auto *ai = static_cast<const int64_t *>(PyArray_DATA(ai_o));
  auto *aj = static_cast<const int64_t *>(PyArray_DATA(aj_o));
  auto *av = static_cast<const double *>(PyArray_DATA(av_o));
  auto *pi = static_cast<const int64_t *>(PyArray_DATA(pi_o));
  auto *pj = static_cast<const int64_t *>(PyArray_DATA(pj_o));
  auto *pv = static_cast<const double *>(PyArray_DATA(pv_o));
  const int64_t n = PyArray_DIM(ai_o, 0) - 1;
  const int64_t nc = (int64_t)nc_l;

  // ---- pass 1: AP = A @ P (CSR, SPA over coarse columns) --------------
  std::vector<int64_t> ap_ptr(n + 1, 0);
  std::vector<int64_t> ap_col;
  std::vector<double> ap_val;
  ap_col.reserve((size_t)(ai[n]));  // heuristic
  ap_val.reserve((size_t)(ai[n]));
  {
    std::vector<double> acc(nc, 0.0);
    std::vector<int64_t> stamp(nc, -1);
    std::vector<int64_t> touched;
    for (int64_t i = 0; i < n; ++i) {
      touched.clear();
      for (int64_t k = ai[i]; k < ai[i + 1]; ++k) {
        const int64_t j = aj[k];
        const double a = av[k];
        if (a == 0.0) continue;
        for (int64_t l = pi[j]; l < pi[j + 1]; ++l) {
          const int64_t c = pj[l];
          if (stamp[c] != i) {
            stamp[c] = i;
            acc[c] = 0.0;
            touched.push_back(c);
          }
          acc[c] += a * pv[l];
        }
      }
      std::sort(touched.begin(), touched.end());
      for (int64_t c : touched) {
        ap_col.push_back(c);
        ap_val.push_back(acc[c]);
      }
      ap_ptr[i + 1] = (int64_t)ap_col.size();
    }
  }

  // ---- transpose P (counting sort) -------------------------------------
  const int64_t pnnz = pi[n];
  std::vector<int64_t> pt_ptr(nc + 1, 0);
  std::vector<int64_t> pt_row(pnnz);
  std::vector<double> pt_val(pnnz);
  for (int64_t k = 0; k < pnnz; ++k) pt_ptr[pj[k] + 1]++;
  for (int64_t c = 0; c < nc; ++c) pt_ptr[c + 1] += pt_ptr[c];
  {
    std::vector<int64_t> cur(pt_ptr.begin(), pt_ptr.end() - 1);
    for (int64_t i = 0; i < n; ++i)
      for (int64_t k = pi[i]; k < pi[i + 1]; ++k) {
        const int64_t dst = cur[pj[k]]++;
        pt_row[dst] = i;
        pt_val[dst] = pv[k];
      }
  }

  // ---- pass 2: C = P^T @ AP --------------------------------------------
  std::vector<int64_t> c_ptr(nc + 1, 0);
  std::vector<int64_t> c_col;
  std::vector<double> c_val;
  c_col.reserve((size_t)pnnz);
  c_val.reserve((size_t)pnnz);
  {
    std::vector<double> acc(nc, 0.0);
    std::vector<int64_t> stamp(nc, -1);
    std::vector<int64_t> touched;
    for (int64_t r = 0; r < nc; ++r) {
      touched.clear();
      for (int64_t k = pt_ptr[r]; k < pt_ptr[r + 1]; ++k) {
        const int64_t i = pt_row[k];
        const double p = pt_val[k];
        if (p == 0.0) continue;
        for (int64_t l = ap_ptr[i]; l < ap_ptr[i + 1]; ++l) {
          const int64_t c = ap_col[l];
          if (stamp[c] != r) {
            stamp[c] = r;
            acc[c] = 0.0;
            touched.push_back(c);
          }
          acc[c] += p * ap_val[l];
        }
      }
      std::sort(touched.begin(), touched.end());
      for (int64_t c : touched) {
        c_col.push_back(c);
        c_val.push_back(acc[c]);
      }
      c_ptr[r + 1] = (int64_t)c_col.size();
    }
  }

  npy_intp d_ptr[1] = {nc + 1};
  npy_intp d_nnz[1] = {(npy_intp)c_col.size()};
  PyArrayObject *out_ptr =
      (PyArrayObject *)PyArray_SimpleNew(1, d_ptr, NPY_INT64);
  PyArrayObject *out_col =
      (PyArrayObject *)PyArray_SimpleNew(1, d_nnz, NPY_INT64);
  PyArrayObject *out_val =
      (PyArrayObject *)PyArray_SimpleNew(1, d_nnz, NPY_FLOAT64);
  std::copy(c_ptr.begin(), c_ptr.end(),
            static_cast<int64_t *>(PyArray_DATA(out_ptr)));
  std::copy(c_col.begin(), c_col.end(),
            static_cast<int64_t *>(PyArray_DATA(out_col)));
  std::copy(c_val.begin(), c_val.end(),
            static_cast<double *>(PyArray_DATA(out_val)));
  return Py_BuildValue("(NNN)", out_ptr, out_col, out_val);
}

PyMethodDef methods[] = {
    {"greedy_color", greedy_color, METH_VARARGS,
     "sequential greedy graph coloring"},
    {"handshake_match", handshake_match, METH_VARARGS,
     "pairwise handshake matching round"},
    {"ell_slots", ell_slots, METH_VARARGS, "CSR->ELL slot computation"},
    {"rap_csr", rap_csr, METH_VARARGS,
     "fused Galerkin triple product P^T A P (scalar CSR)"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_ngsamg_native", nullptr,
                         -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__ngsamg_native(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
