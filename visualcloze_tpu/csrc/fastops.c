/* fastops: native host-side image preprocessing for the data path.
 *
 * TPU-native counterpart of the native machinery inside the reference's data
 * loader (torch DataLoader's C++ worker pool + torchvision's C++ transforms,
 * SURVEY.md §2.9): the grid pipeline's hot host ops — bilinear resize with
 * [-1, 1] normalization, and row assembly (horizontal concat + normalize) —
 * implemented in C with OpenMP row-parallelism, exposed through the CPython
 * C API (no pybind11 in this image). data/loader.py and
 * pipeline/preprocessing.py use these as a fast path with a pure-Python
 * fallback, so the wheel works without compilation.
 *
 * Build: python setup.py build_ext --inplace   (see repo setup.py)
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>
#include <math.h>
#include <stdint.h>
#ifdef _OPENMP
#include <omp.h>
#endif

/* Bilinear sample of uint8 HWC(3) image, align_corners=False convention
 * (matches PIL/torch bilinear closely enough for data augmentation). */
static void resize_normalize_kernel(const uint8_t *src, npy_intp sh, npy_intp sw,
                                    float *dst, npy_intp dh, npy_intp dw) {
    const float scale_y = (float)sh / (float)dh;
    const float scale_x = (float)sw / (float)dw;
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (npy_intp y = 0; y < dh; ++y) {
        float fy = ((float)y + 0.5f) * scale_y - 0.5f;
        if (fy < 0) fy = 0;
        npy_intp y0 = (npy_intp)fy;
        npy_intp y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
        float wy = fy - (float)y0;
        for (npy_intp x = 0; x < dw; ++x) {
            float fx = ((float)x + 0.5f) * scale_x - 0.5f;
            if (fx < 0) fx = 0;
            npy_intp x0 = (npy_intp)fx;
            npy_intp x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
            float wx = fx - (float)x0;
            const uint8_t *p00 = src + (y0 * sw + x0) * 3;
            const uint8_t *p01 = src + (y0 * sw + x1) * 3;
            const uint8_t *p10 = src + (y1 * sw + x0) * 3;
            const uint8_t *p11 = src + (y1 * sw + x1) * 3;
            float *out = dst + (y * dw + x) * 3;
            for (int c = 0; c < 3; ++c) {
                float top = (1.0f - wx) * p00[c] + wx * p01[c];
                float bot = (1.0f - wx) * p10[c] + wx * p11[c];
                float v = (1.0f - wy) * top + wy * bot;
                out[c] = v * (2.0f / 255.0f) - 1.0f; /* [-1, 1] */
            }
        }
    }
}

/* resize_normalize(src: uint8 (H, W, 3) C-contig, out_h, out_w)
 *   -> float32 (out_h, out_w, 3) in [-1, 1] */
static PyObject *py_resize_normalize(PyObject *self, PyObject *args) {
    PyArrayObject *src;
    long out_h, out_w;
    if (!PyArg_ParseTuple(args, "O!ll", &PyArray_Type, &src, &out_h, &out_w))
        return NULL;
    if (PyArray_TYPE(src) != NPY_UINT8 || PyArray_NDIM(src) != 3 ||
        PyArray_DIM(src, 2) != 3 || !PyArray_IS_C_CONTIGUOUS(src)) {
        PyErr_SetString(PyExc_ValueError, "src must be C-contiguous uint8 (H, W, 3)");
        return NULL;
    }
    if (out_h <= 0 || out_w <= 0) {
        PyErr_SetString(PyExc_ValueError, "output dims must be positive");
        return NULL;
    }
    npy_intp dims[3] = {out_h, out_w, 3};
    PyArrayObject *dst = (PyArrayObject *)PyArray_SimpleNew(3, dims, NPY_FLOAT32);
    if (!dst) return NULL;
    Py_BEGIN_ALLOW_THREADS
    resize_normalize_kernel((const uint8_t *)PyArray_DATA(src),
                            PyArray_DIM(src, 0), PyArray_DIM(src, 1),
                            (float *)PyArray_DATA(dst), out_h, out_w);
    Py_END_ALLOW_THREADS
    return (PyObject *)dst;
}

/* hconcat_normalize(cells: sequence of uint8 (H, W_i, 3) C-contig arrays,
 *                   same H) -> float32 (H, sum W_i, 3) in [-1, 1] */
static PyObject *py_hconcat_normalize(PyObject *self, PyObject *args) {
    PyObject *seq;
    if (!PyArg_ParseTuple(args, "O", &seq)) return NULL;
    PyObject *fast = PySequence_Fast(seq, "expected a sequence of arrays");
    if (!fast) return NULL;
    Py_ssize_t n = PySequence_Fast_GET_SIZE(fast);
    if (n == 0) {
        Py_DECREF(fast);
        PyErr_SetString(PyExc_ValueError, "empty cell list");
        return NULL;
    }
    npy_intp H = -1, total_w = 0;
    for (Py_ssize_t i = 0; i < n; ++i) {
        PyObject *o = PySequence_Fast_GET_ITEM(fast, i);
        if (!PyArray_Check(o)) {
            Py_DECREF(fast);
            PyErr_SetString(PyExc_TypeError, "cells must be numpy arrays");
            return NULL;
        }
        PyArrayObject *a = (PyArrayObject *)o;
        if (PyArray_TYPE(a) != NPY_UINT8 || PyArray_NDIM(a) != 3 ||
            PyArray_DIM(a, 2) != 3 || !PyArray_IS_C_CONTIGUOUS(a)) {
            Py_DECREF(fast);
            PyErr_SetString(PyExc_ValueError, "cells must be C-contiguous uint8 (H, W, 3)");
            return NULL;
        }
        if (H < 0) H = PyArray_DIM(a, 0);
        else if (PyArray_DIM(a, 0) != H) {
            Py_DECREF(fast);
            PyErr_SetString(PyExc_ValueError, "cells must share the same height");
            return NULL;
        }
        total_w += PyArray_DIM(a, 1);
    }
    npy_intp dims[3] = {H, total_w, 3};
    PyArrayObject *dst = (PyArrayObject *)PyArray_SimpleNew(3, dims, NPY_FLOAT32);
    if (!dst) {
        Py_DECREF(fast);
        return NULL;
    }
    float *out = (float *)PyArray_DATA(dst);
    npy_intp x_off = 0;
    for (Py_ssize_t i = 0; i < n; ++i) {
        PyArrayObject *a = (PyArrayObject *)PySequence_Fast_GET_ITEM(fast, i);
        const uint8_t *sp = (const uint8_t *)PyArray_DATA(a);
        npy_intp w = PyArray_DIM(a, 1);
        Py_BEGIN_ALLOW_THREADS
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
        for (npy_intp y = 0; y < H; ++y) {
            const uint8_t *srow = sp + y * w * 3;
            float *drow = out + (y * total_w + x_off) * 3;
            for (npy_intp j = 0; j < w * 3; ++j)
                drow[j] = (float)srow[j] * (2.0f / 255.0f) - 1.0f;
        }
        Py_END_ALLOW_THREADS
        x_off += w;
    }
    Py_DECREF(fast);
    return (PyObject *)dst;
}

static PyMethodDef methods[] = {
    {"resize_normalize", py_resize_normalize, METH_VARARGS,
     "Bilinear resize uint8 HWC image to float32 [-1,1]."},
    {"hconcat_normalize", py_hconcat_normalize, METH_VARARGS,
     "Horizontally concat uint8 HWC cells into a float32 [-1,1] row."},
    {NULL, NULL, 0, NULL}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_fastops", "Native host image preprocessing.", -1, methods};

PyMODINIT_FUNC PyInit__fastops(void) {
    import_array();
    return PyModule_Create(&moduledef);
}
