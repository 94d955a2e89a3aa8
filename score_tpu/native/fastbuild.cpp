// Native host-side assembly kernels (CPython extension).
//
// The factor-graph -> conic-program compilation (score_tpu/assembly/conic.py)
// emits ~6 sparse cost rows per pose measurement and one cone block per
// range measurement. The pure-Python emission loop is the host-side
// bottleneck at 20-robot scale (tens of thousands of measurements); these
// kernels produce the same encodings in C++ at memory bandwidth. The
// Python builder remains as the reference implementation and fallback —
// assembly/conic.py uses this extension when importable and verifies
// against it in tests.
//
// This is the TPU framework's native "graph builder" runtime component
// (the reference's equivalent work happens inside Gurobi's C model-building
// API, gurobi_utils.py:221-352).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cstdint>

namespace {

// Emit the 6 cost rows of one 2D relative-pose measurement into the
// (rows, nnz) cols/coefs arrays plus b/w vectors, starting at row `rb`.
// Column layout (assembly/conic.py VariableIndex): pose p occupies columns
// [p*6, p*6+6) column-major: R(r,c) -> p*6 + c*2 + r, t(r) -> p*6 + 4 + r.
inline void emit_pose_rows_2d(
    int64_t rb, int64_t pi, int64_t pj,
    const double* Rm,  // 2x2 row-major
    const double* tm,  // 2
    double kij, double tau,
    int64_t nnz, int64_t pad_col,
    int32_t* cols, double* coefs, double* b, double* w) {
  const int64_t bi = pi * 6, bj = pj * 6;
  // rotation rows: residual (R_j - R_i Rm)[r, c], c-major then r
  for (int c = 0; c < 2; ++c) {
    for (int r = 0; r < 2; ++r) {
      const int64_t row = rb + c * 2 + r;
      int32_t* cr = cols + row * nnz;
      double* vr = coefs + row * nnz;
      for (int64_t k = 0; k < nnz; ++k) { cr[k] = (int32_t)pad_col; vr[k] = 0.0; }
      cr[0] = (int32_t)(bj + c * 2 + r); vr[0] = 1.0;
      cr[1] = (int32_t)(bi + 0 * 2 + r); vr[1] = -Rm[0 * 2 + c];
      cr[2] = (int32_t)(bi + 1 * 2 + r); vr[2] = -Rm[1 * 2 + c];
      b[row] = 0.0;
      w[row] = tau;
    }
  }
  // translation rows: residual (t_j - t_i - R_i tm)[r]
  for (int r = 0; r < 2; ++r) {
    const int64_t row = rb + 4 + r;
    int32_t* cr = cols + row * nnz;
    double* vr = coefs + row * nnz;
    for (int64_t k = 0; k < nnz; ++k) { cr[k] = (int32_t)pad_col; vr[k] = 0.0; }
    cr[0] = (int32_t)(bj + 4 + r); vr[0] = 1.0;
    cr[1] = (int32_t)(bi + 4 + r); vr[1] = -1.0;
    cr[2] = (int32_t)(bi + 0 * 2 + r); vr[2] = -tm[0];
    cr[3] = (int32_t)(bi + 1 * 2 + r); vr[3] = -tm[1];
    b[row] = 0.0;
    w[row] = kij;
  }
}

PyObject* assemble_pose_rows_2d(PyObject*, PyObject* args) {
  PyArrayObject *pi_a, *pj_a, *Rm_a, *tm_a, *kij_a, *tau_a;
  long long nnz_l, pad_l;
  if (!PyArg_ParseTuple(args, "O!O!O!O!O!O!LL",
                        &PyArray_Type, &pi_a, &PyArray_Type, &pj_a,
                        &PyArray_Type, &Rm_a, &PyArray_Type, &tm_a,
                        &PyArray_Type, &kij_a, &PyArray_Type, &tau_a,
                        &nnz_l, &pad_l)) {
    return nullptr;
  }
  const int64_t NE = (int64_t)PyArray_DIM(pi_a, 0);
  const int64_t nnz = (int64_t)nnz_l;
  const int64_t pad = (int64_t)pad_l;
  if (nnz < 4) {
    PyErr_SetString(PyExc_ValueError, "nnz must be >= 4 for 2D pose rows");
    return nullptr;
  }

  npy_intp dims2[2] = {(npy_intp)(NE * 6), (npy_intp)nnz};
  npy_intp dims1[1] = {(npy_intp)(NE * 6)};
  PyArrayObject* cols_a =
      (PyArrayObject*)PyArray_SimpleNew(2, dims2, NPY_INT32);
  PyArrayObject* coefs_a =
      (PyArrayObject*)PyArray_SimpleNew(2, dims2, NPY_FLOAT64);
  PyArrayObject* b_a = (PyArrayObject*)PyArray_SimpleNew(1, dims1, NPY_FLOAT64);
  PyArrayObject* w_a = (PyArrayObject*)PyArray_SimpleNew(1, dims1, NPY_FLOAT64);
  if (!cols_a || !coefs_a || !b_a || !w_a) return nullptr;

  const int64_t* pi = (const int64_t*)PyArray_DATA(pi_a);
  const int64_t* pj = (const int64_t*)PyArray_DATA(pj_a);
  const double* Rm = (const double*)PyArray_DATA(Rm_a);
  const double* tm = (const double*)PyArray_DATA(tm_a);
  const double* kij = (const double*)PyArray_DATA(kij_a);
  const double* tau = (const double*)PyArray_DATA(tau_a);
  int32_t* cols = (int32_t*)PyArray_DATA(cols_a);
  double* coefs = (double*)PyArray_DATA(coefs_a);
  double* b = (double*)PyArray_DATA(b_a);
  double* w = (double*)PyArray_DATA(w_a);

  Py_BEGIN_ALLOW_THREADS
  for (int64_t e = 0; e < NE; ++e) {
    emit_pose_rows_2d(e * 6, pi[e], pj[e], Rm + e * 4, tm + e * 2,
                      kij[e], tau[e], nnz, pad, cols, coefs, b, w);
  }
  Py_END_ALLOW_THREADS

  return Py_BuildValue("(NNNN)", cols_a, coefs_a, b_a, w_a);
}

PyMethodDef methods[] = {
    {"assemble_pose_rows_2d", assemble_pose_rows_2d, METH_VARARGS,
     "Emit 2D relative-pose cost rows: (pose_i, pose_j, Rm, tm, kij, tau, "
     "nnz, pad_col) -> (cols, coefs, b, w)"},
    {nullptr, nullptr, 0, nullptr},
};

struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastbuild",
    "Native host-side conic-assembly kernels", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__fastbuild(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
