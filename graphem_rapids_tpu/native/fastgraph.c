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

static PyMethodDef FastgraphMethods[] = {
    {"parse_edges", parse_edges, METH_VARARGS,
     "parse_edges(data: bytes, one_based: int, skip_header: int) -> bytes\n"
     "Parse a whitespace edge list into packed little-endian int64 pairs."},
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
