/* _fastgraph: native edge-list parsing for the dataset loader.
 *
 * The reference parses SNAP/MTX edge files line-by-line in Python
 * (graphem_rapids/datasets.py:306-357, :485-559); the TPU framework's
 * loaders feed 1M+ edge graphs, so parsing is a host-side bottleneck.
 * This module scans the raw bytes once with strtoll: comment lines
 * ('#', '%') are skipped, the first data line can be skipped (Matrix
 * Market dimension row), trailing columns are ignored, and the result is
 * returned as packed int64 pairs for zero-copy numpy wrapping
 * (np.frombuffer(...).reshape(-1, 2)).
 *
 * Built via setup_native.py; graphem_rapids_tpu.datasets falls back to
 * the pandas tokenizer when the extension is absent.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdlib.h>

static PyObject *
parse_edges(PyObject *self, PyObject *args)
{
    Py_buffer view;
    int one_based = 0, skip_header = 0;
    if (!PyArg_ParseTuple(args, "y*ii", &view, &one_based, &skip_header))
        return NULL;

    const char *p = (const char *)view.buf;
    const char *end = p + view.len;

    Py_ssize_t cap = 4096, n = 0;
    long long *out = (long long *)malloc((size_t)cap * 2 * sizeof(long long));
    if (out == NULL) {
        PyBuffer_Release(&view);
        return PyErr_NoMemory();
    }

    int header_pending = skip_header;
    while (p < end) {
        /* skip blank space / line terminators */
        while (p < end && (*p == '\n' || *p == '\r' || *p == ' '
                           || *p == '\t'))
            p++;
        if (p >= end)
            break;
        if (*p == '#' || *p == '%') { /* comment line */
            while (p < end && *p != '\n')
                p++;
            continue;
        }
        char *q;
        long long a = strtoll(p, &q, 10);
        if (q == p) { /* unparsable line */
            while (p < end && *p != '\n')
                p++;
            continue;
        }
        p = q;
        /* second field must be on the SAME line: strtoll would happily
         * skip the newline and steal the next line's first number. */
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\r'))
            p++;
        if (p >= end || *p == '\n'
            || !(*p == '-' || *p == '+' || (*p >= '0' && *p <= '9'))) {
            while (p < end && *p != '\n')
                p++;
            continue;
        }
        long long b = strtoll(p, &q, 10);
        if (q == p) {
            while (p < end && *p != '\n')
                p++;
            continue;
        }
        p = q;
        while (p < end && *p != '\n') /* ignore extra columns */
            p++;

        if (header_pending) { /* first data row = MTX dimensions */
            header_pending = 0;
            continue;
        }
        if (n >= cap) {
            cap *= 2;
            long long *grown =
                (long long *)realloc(out, (size_t)cap * 2 * sizeof(long long));
            if (grown == NULL) {
                free(out);
                PyBuffer_Release(&view);
                return PyErr_NoMemory();
            }
            out = grown;
        }
        out[2 * n] = a - one_based;
        out[2 * n + 1] = b - one_based;
        n++;
    }
    PyBuffer_Release(&view);

    PyObject *res = PyBytes_FromStringAndSize((const char *)out,
                                              (Py_ssize_t)(n * 2 *
                                                           (Py_ssize_t)
                                                           sizeof(long long)));
    free(out);
    return res;
}

/* ------------------------------------------------------------------ *
 * csr_lt_edges: threaded upper-triangle edge extraction from CSR.
 *
 * The vectorized-numpy version (models/embedder.py
 * _extract_edges_from_adjacency) materializes a 2*nnz row-id array via
 * np.repeat plus boolean masks — 17 s at n=10M / nnz=70M, all
 * memory-bandwidth on one core. Here each thread scans its own row
 * range of the CSR structure twice (count, then fill) and writes i<j
 * pairs as packed int32 — bounded by one streaming read of `indices`.
 * Callers guard the explicit-zeros case (falls back to numpy).
 * ------------------------------------------------------------------ */

#include <pthread.h>
#include <stdint.h>
#include <string.h>

typedef struct {
    const void *indptr;
    const void *indices;
    int ip64;       /* indptr is int64 (else int32) */
    int ix64;       /* indices is int64 (else int32) */
    int64_t row_lo; /* [row_lo, row_hi) */
    int64_t row_hi;
    int64_t count;  /* out: number of i<j pairs in range */
    int32_t *out;   /* fill phase: destination (already offset) */
} lt_range;

static inline int64_t ptr_at(const void *p, int is64, int64_t i)
{
    return is64 ? ((const int64_t *)p)[i] : (int64_t)((const int32_t *)p)[i];
}

static void *lt_count_worker(void *arg)
{
    lt_range *r = (lt_range *)arg;
    int64_t c = 0;
    for (int64_t row = r->row_lo; row < r->row_hi; row++) {
        int64_t s = ptr_at(r->indptr, r->ip64, row);
        int64_t e = ptr_at(r->indptr, r->ip64, row + 1);
        for (int64_t k = s; k < e; k++)
            if (ptr_at(r->indices, r->ix64, k) > row)
                c++;
    }
    r->count = c;
    return NULL;
}

static void *lt_fill_worker(void *arg)
{
    lt_range *r = (lt_range *)arg;
    int32_t *o = r->out;
    for (int64_t row = r->row_lo; row < r->row_hi; row++) {
        int64_t s = ptr_at(r->indptr, r->ip64, row);
        int64_t e = ptr_at(r->indptr, r->ip64, row + 1);
        for (int64_t k = s; k < e; k++) {
            int64_t col = ptr_at(r->indices, r->ix64, k);
            if (col > row) {
                *o++ = (int32_t)row;
                *o++ = (int32_t)col;
            }
        }
    }
    return NULL;
}

#define LT_MAX_THREADS 16

static PyObject *
csr_lt_edges(PyObject *self, PyObject *args)
{
    Py_buffer ip_view, ix_view;
    int ip64, ix64;
    long long n_ll, nthreads_ll;
    if (!PyArg_ParseTuple(args, "y*y*iiLL", &ip_view, &ix_view,
                          &ip64, &ix64, &n_ll, &nthreads_ll))
        return NULL;
    int64_t n = (int64_t)n_ll;
    int T = (int)nthreads_ll;
    if (T < 1) T = 1;
    if (T > LT_MAX_THREADS) T = LT_MAX_THREADS;
    if ((Py_ssize_t)((n + 1) * (ip64 ? 8 : 4)) > ip_view.len) {
        PyBuffer_Release(&ip_view);
        PyBuffer_Release(&ix_view);
        PyErr_SetString(PyExc_ValueError, "indptr buffer too small for n");
        return NULL;
    }

    const void *indptr = ip_view.buf;
    const void *indices = ix_view.buf;
    int64_t nnz = ptr_at(indptr, ip64, n);
    if ((Py_ssize_t)(nnz * (ix64 ? 8 : 4)) > ix_view.len) {
        PyBuffer_Release(&ip_view);
        PyBuffer_Release(&ix_view);
        PyErr_SetString(PyExc_ValueError, "indices buffer too small");
        return NULL;
    }

    /* split rows so each thread owns ~nnz/T entries (balanced even for
     * skewed degree distributions) */
    lt_range ranges[LT_MAX_THREADS];
    pthread_t tids[LT_MAX_THREADS];
    int64_t row = 0;
    for (int t = 0; t < T; t++) {
        int64_t target = nnz * (t + 1) / T;
        int64_t hi = row;
        while (hi < n && ptr_at(indptr, ip64, hi) < target)
            hi++;
        if (t == T - 1)
            hi = n;
        ranges[t].indptr = indptr;
        ranges[t].indices = indices;
        ranges[t].ip64 = ip64;
        ranges[t].ix64 = ix64;
        ranges[t].row_lo = row;
        ranges[t].row_hi = hi;
        ranges[t].count = 0;
        row = hi;
    }

    Py_BEGIN_ALLOW_THREADS
    for (int t = 0; t < T; t++)
        pthread_create(&tids[t], NULL, lt_count_worker, &ranges[t]);
    for (int t = 0; t < T; t++)
        pthread_join(tids[t], NULL);
    Py_END_ALLOW_THREADS

    int64_t total = 0;
    for (int t = 0; t < T; t++)
        total += ranges[t].count;

    PyObject *res = PyBytes_FromStringAndSize(NULL,
        (Py_ssize_t)(total * 2 * (int64_t)sizeof(int32_t)));
    if (res == NULL) {
        PyBuffer_Release(&ip_view);
        PyBuffer_Release(&ix_view);
        return NULL;
    }
    int32_t *out = (int32_t *)PyBytes_AS_STRING(res);
    int64_t off = 0;
    for (int t = 0; t < T; t++) {
        ranges[t].out = out + 2 * off;
        off += ranges[t].count;
    }

    Py_BEGIN_ALLOW_THREADS
    for (int t = 0; t < T; t++)
        pthread_create(&tids[t], NULL, lt_fill_worker, &ranges[t]);
    for (int t = 0; t < T; t++)
        pthread_join(tids[t], NULL);
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&ip_view);
    PyBuffer_Release(&ix_view);
    return res;
}

static PyMethodDef FastgraphMethods[] = {
    {"parse_edges", parse_edges, METH_VARARGS,
     "parse_edges(data: bytes, one_based: int, skip_header: int) -> bytes\n"
     "Parse a whitespace edge list into packed little-endian int64 pairs."},
    {"csr_lt_edges", csr_lt_edges, METH_VARARGS,
     "csr_lt_edges(indptr, indices, indptr_is64, indices_is64, n,"
     " nthreads) -> bytes\n"
     "Extract upper-triangle (i<j) edges from CSR structure as packed"
     " int32 pairs, threaded."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef fastgraphmodule = {
    PyModuleDef_HEAD_INIT, "_fastgraph",
    "Native edge-list parser for graphem_rapids_tpu dataset loaders.", -1,
    FastgraphMethods,
};

PyMODINIT_FUNC
PyInit__fastgraph(void)
{
    return PyModule_Create(&fastgraphmodule);
}
