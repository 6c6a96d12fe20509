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

/* ------------------------------------------------------------------ *
 * radix_argsort_u64: threaded stable LSD radix argsort.
 *
 * numpy's introsort-based argsort on the binned-table build's pack keys
 * (e_lo * n + e_hi, 35M int64 entries at the 10M-vertex tier) runs
 * ~9.7 s single-threaded; the table build also pays two more stable
 * E-argsorts and an n-argsort (ops/forces.py
 * build_neighbor_table_binned). This is a classic parallel LSD radix:
 * per pass of 16-bit digits, each thread histograms its contiguous
 * chunk, a serial (digit-major, thread-minor) exclusive scan assigns
 * stable scatter bases, and each thread scatters (key, index) pairs.
 * Chunks are processed in index order within each digit, so the sort is
 * stable; the pass count adapts to the maximum key (3 passes for the
 * 47-bit pack keys, 2 for 32-bit column keys, 1 for small degree keys).
 * ------------------------------------------------------------------ */

#define RS_RADIX_BITS 16
#define RS_RADIX (1 << RS_RADIX_BITS)
#define RS_MASK (RS_RADIX - 1)

typedef struct {
    const uint64_t *keys_in;
    uint64_t *keys_out;
    const int32_t *idx_in;
    int32_t *idx_out;
    int64_t lo, hi;
    int shift;
    int64_t *hist; /* RS_RADIX entries owned by this thread */
} rs_range;

static void *rs_hist_worker(void *arg)
{
    rs_range *r = (rs_range *)arg;
    memset(r->hist, 0, RS_RADIX * sizeof(int64_t));
    const uint64_t *k = r->keys_in;
    int shift = r->shift;
    for (int64_t i = r->lo; i < r->hi; i++)
        r->hist[(k[i] >> shift) & RS_MASK]++;
    return NULL;
}

static void *rs_scatter_worker(void *arg)
{
    rs_range *r = (rs_range *)arg;
    const uint64_t *k = r->keys_in;
    const int32_t *x = r->idx_in;
    int shift = r->shift;
    for (int64_t i = r->lo; i < r->hi; i++) {
        int64_t pos = r->hist[(k[i] >> shift) & RS_MASK]++;
        r->keys_out[pos] = k[i];
        r->idx_out[pos] = x[i];
    }
    return NULL;
}

typedef struct {
    const uint64_t *keys;
    int64_t lo, hi;
    uint64_t maxk;
} rs_max_range;

static void *rs_max_worker(void *arg)
{
    rs_max_range *r = (rs_max_range *)arg;
    uint64_t m = 0;
    for (int64_t i = r->lo; i < r->hi; i++)
        if (r->keys[i] > m)
            m = r->keys[i];
    r->maxk = m;
    return NULL;
}

static PyObject *
radix_argsort_u64(PyObject *self, PyObject *args)
{
    Py_buffer kview;
    long long nthreads_ll;
    if (!PyArg_ParseTuple(args, "y*L", &kview, &nthreads_ll))
        return NULL;
    int64_t E = kview.len / (int64_t)sizeof(uint64_t);
    int T = (int)nthreads_ll;
    if (T < 1) T = 1;
    if (T > LT_MAX_THREADS) T = LT_MAX_THREADS;
    if (E > 0 && E < 4 * T)
        T = 1;

    PyObject *res = PyBytes_FromStringAndSize(NULL,
        (Py_ssize_t)(E * (int64_t)sizeof(int32_t)));
    if (res == NULL) {
        PyBuffer_Release(&kview);
        return NULL;
    }
    if (E == 0) {
        PyBuffer_Release(&kview);
        return res;
    }

    uint64_t *k0 = (uint64_t *)malloc((size_t)E * sizeof(uint64_t));
    uint64_t *k1 = (uint64_t *)malloc((size_t)E * sizeof(uint64_t));
    int32_t *i0 = (int32_t *)malloc((size_t)E * sizeof(int32_t));
    int32_t *i1 = (int32_t *)malloc((size_t)E * sizeof(int32_t));
    int64_t *hists = (int64_t *)malloc(
        (size_t)T * RS_RADIX * sizeof(int64_t));
    if (!k0 || !k1 || !i0 || !i1 || !hists) {
        free(k0); free(k1); free(i0); free(i1); free(hists);
        Py_DECREF(res);
        PyBuffer_Release(&kview);
        return PyErr_NoMemory();
    }

    const uint64_t *src_keys = (const uint64_t *)kview.buf;
    rs_range ranges[LT_MAX_THREADS];
    rs_max_range mranges[LT_MAX_THREADS];
    pthread_t tids[LT_MAX_THREADS];
    uint64_t maxk = 0;

    Py_BEGIN_ALLOW_THREADS
    memcpy(k0, src_keys, (size_t)E * sizeof(uint64_t));
    for (int64_t i = 0; i < E; i++)
        i0[i] = (int32_t)i;
    for (int t = 0; t < T; t++) {
        mranges[t].keys = k0;
        mranges[t].lo = E * t / T;
        mranges[t].hi = E * (t + 1) / T;
        pthread_create(&tids[t], NULL, rs_max_worker, &mranges[t]);
    }
    for (int t = 0; t < T; t++) {
        pthread_join(tids[t], NULL);
        if (mranges[t].maxk > maxk)
            maxk = mranges[t].maxk;
    }

    int passes = 1;
    while (passes < 4 && (maxk >> ((uint64_t)passes * RS_RADIX_BITS)))
        passes++;

    uint64_t *kc = k0, *kn = k1;
    int32_t *ic = i0, *in_ = i1;
    for (int p = 0; p < passes; p++) {
        int shift = p * RS_RADIX_BITS;
        for (int t = 0; t < T; t++) {
            ranges[t].keys_in = kc;
            ranges[t].keys_out = kn;
            ranges[t].idx_in = ic;
            ranges[t].idx_out = in_;
            ranges[t].lo = E * t / T;
            ranges[t].hi = E * (t + 1) / T;
            ranges[t].shift = shift;
            ranges[t].hist = hists + (int64_t)t * RS_RADIX;
            pthread_create(&tids[t], NULL, rs_hist_worker, &ranges[t]);
        }
        for (int t = 0; t < T; t++)
            pthread_join(tids[t], NULL);
        /* stable scatter bases: digit-major, thread-minor exclusive scan */
        int64_t run = 0;
        for (int d = 0; d < RS_RADIX; d++) {
            for (int t = 0; t < T; t++) {
                int64_t c = hists[(int64_t)t * RS_RADIX + d];
                hists[(int64_t)t * RS_RADIX + d] = run;
                run += c;
            }
        }
        for (int t = 0; t < T; t++)
            pthread_create(&tids[t], NULL, rs_scatter_worker, &ranges[t]);
        for (int t = 0; t < T; t++)
            pthread_join(tids[t], NULL);
        uint64_t *tk = kc; kc = kn; kn = tk;
        int32_t *ti = ic; ic = in_; in_ = ti;
    }
    memcpy(PyBytes_AS_STRING(res), ic, (size_t)E * sizeof(int32_t));
    Py_END_ALLOW_THREADS

    free(k0); free(k1); free(i0); free(i1); free(hists);
    PyBuffer_Release(&kview);
    return res;
}

/* ------------------------------------------------------------------ *
 * Threaded helpers for the binned-neighbor-table host build
 * (ops/forces.py build_neighbor_table_binned). Each replaces a
 * single-threaded numpy line that showed up in the 10M-vertex build's
 * line profile; all are embarrassingly parallel over contiguous edge
 * chunks (every write index is unique).
 * ------------------------------------------------------------------ */

typedef struct {
    const int32_t *edges;   /* (E, 2) */
    const int32_t *inv;     /* (n,) */
    int32_t *lo;            /* out (E,) */
    int32_t *hi;            /* out (E,) */
    int64_t lo_i, hi_i;
} pm_range;

static void *pm_worker(void *arg)
{
    pm_range *r = (pm_range *)arg;
    for (int64_t i = r->lo_i; i < r->hi_i; i++) {
        int32_t a = r->inv[r->edges[2 * i]];
        int32_t b = r->inv[r->edges[2 * i + 1]];
        r->lo[i] = a < b ? a : b;
        r->hi[i] = a < b ? b : a;
    }
    return NULL;
}

/* apply_perm_minmax(edges (E,2) i32, inv (n,) i32, nthreads)
 *   -> bytes packed as [e_lo (E,) i32 | e_hi (E,) i32]
 * Replaces: a = inv[edges]; e_lo = min(a[:,0], a[:,1]); e_hi = max(...) */
static PyObject *
apply_perm_minmax(PyObject *self, PyObject *args)
{
    Py_buffer ev, iv;
    long long nthreads_ll;
    if (!PyArg_ParseTuple(args, "y*y*L", &ev, &iv, &nthreads_ll))
        return NULL;
    int64_t E = ev.len / (2 * (int64_t)sizeof(int32_t));
    int T = (int)nthreads_ll;
    if (T < 1) T = 1;
    if (T > LT_MAX_THREADS) T = LT_MAX_THREADS;
    if (E > 0 && E < 4 * T) T = 1;

    PyObject *res = PyBytes_FromStringAndSize(NULL,
        (Py_ssize_t)(2 * E * (int64_t)sizeof(int32_t)));
    if (res == NULL) {
        PyBuffer_Release(&ev);
        PyBuffer_Release(&iv);
        return NULL;
    }
    int32_t *lo = (int32_t *)PyBytes_AS_STRING(res);
    int32_t *hi = lo + E;
    pm_range ranges[LT_MAX_THREADS];
    pthread_t tids[LT_MAX_THREADS];

    Py_BEGIN_ALLOW_THREADS
    for (int t = 0; t < T; t++) {
        ranges[t].edges = (const int32_t *)ev.buf;
        ranges[t].inv = (const int32_t *)iv.buf;
        ranges[t].lo = lo;
        ranges[t].hi = hi;
        ranges[t].lo_i = E * t / T;
        ranges[t].hi_i = E * (t + 1) / T;
        pthread_create(&tids[t], NULL, pm_worker, &ranges[t]);
    }
    for (int t = 0; t < T; t++)
        pthread_join(tids[t], NULL);
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&ev);
    PyBuffer_Release(&iv);
    return res;
}

typedef struct {
    const int32_t *lo;
    const int32_t *hi;
    const int32_t *order;
    int32_t *pairs;   /* out (E, 2) */
    int32_t *invp;    /* out (E,): invp[order[i]] = i */
    int64_t lo_i, hi_i;
} pp_range;

static void *pp_worker(void *arg)
{
    pp_range *r = (pp_range *)arg;
    for (int64_t i = r->lo_i; i < r->hi_i; i++) {
        int32_t p = r->order[i];
        r->pairs[2 * i] = r->lo[p];
        r->pairs[2 * i + 1] = r->hi[p];
        r->invp[p] = (int32_t)i;
    }
    return NULL;
}

/* permute_pairs(e_lo (E,) i32, e_hi (E,) i32, order (E,) i32, nthreads)
 *   -> (bytes pairs (E,2) i32, bytes inverse-perm (E,) i32)
 * Replaces: column_stack([e_lo[order], e_hi[order]]) and
 *           edge_map[order] = arange(E) */
static PyObject *
permute_pairs(PyObject *self, PyObject *args)
{
    Py_buffer lv, hv, ov;
    long long nthreads_ll;
    if (!PyArg_ParseTuple(args, "y*y*y*L", &lv, &hv, &ov, &nthreads_ll))
        return NULL;
    int64_t E = ov.len / (int64_t)sizeof(int32_t);
    int T = (int)nthreads_ll;
    if (T < 1) T = 1;
    if (T > LT_MAX_THREADS) T = LT_MAX_THREADS;
    if (E > 0 && E < 4 * T) T = 1;

    PyObject *pairs = PyBytes_FromStringAndSize(NULL,
        (Py_ssize_t)(2 * E * (int64_t)sizeof(int32_t)));
    PyObject *invp = PyBytes_FromStringAndSize(NULL,
        (Py_ssize_t)(E * (int64_t)sizeof(int32_t)));
    if (pairs == NULL || invp == NULL) {
        Py_XDECREF(pairs);
        Py_XDECREF(invp);
        PyBuffer_Release(&lv);
        PyBuffer_Release(&hv);
        PyBuffer_Release(&ov);
        return NULL;
    }
    pp_range ranges[LT_MAX_THREADS];
    pthread_t tids[LT_MAX_THREADS];

    Py_BEGIN_ALLOW_THREADS
    for (int t = 0; t < T; t++) {
        ranges[t].lo = (const int32_t *)lv.buf;
        ranges[t].hi = (const int32_t *)hv.buf;
        ranges[t].order = (const int32_t *)ov.buf;
        ranges[t].pairs = (int32_t *)PyBytes_AS_STRING(pairs);
        ranges[t].invp = (int32_t *)PyBytes_AS_STRING(invp);
        ranges[t].lo_i = E * t / T;
        ranges[t].hi_i = E * (t + 1) / T;
        pthread_create(&tids[t], NULL, pp_worker, &ranges[t]);
    }
    for (int t = 0; t < T; t++)
        pthread_join(tids[t], NULL);
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&lv);
    PyBuffer_Release(&hv);
    PyBuffer_Release(&ov);
    return Py_BuildValue("(NN)", pairs, invp);
}

typedef struct {
    const int32_t *perm;    /* (E,) rank -> element */
    const int32_t *keys;    /* (E,) element -> key vertex */
    const int32_t *starts;  /* (n,) key -> first rank */
    int32_t *out;           /* (E,): out[perm[i]] = i - starts[keys[perm[i]]] */
    int64_t lo_i, hi_i;
} sr_range;

static void *sr_worker(void *arg)
{
    sr_range *r = (sr_range *)arg;
    for (int64_t i = r->lo_i; i < r->hi_i; i++) {
        int32_t p = r->perm[i];
        r->out[p] = (int32_t)i - r->starts[r->keys[p]];
    }
    return NULL;
}

/* scatter_ranks(perm (E,) i32, keys (E,) i32, starts (n,) i32, nthreads)
 *   -> bytes (E,) i32 with out[perm[i]] = i - starts[keys[perm[i]]]
 * Replaces: col[perm] = arange(E) - starts[keys[perm]] */
static PyObject *
scatter_ranks(PyObject *self, PyObject *args)
{
    Py_buffer pv, kv, sv;
    long long nthreads_ll;
    if (!PyArg_ParseTuple(args, "y*y*y*L", &pv, &kv, &sv, &nthreads_ll))
        return NULL;
    int64_t E = pv.len / (int64_t)sizeof(int32_t);
    int T = (int)nthreads_ll;
    if (T < 1) T = 1;
    if (T > LT_MAX_THREADS) T = LT_MAX_THREADS;
    if (E > 0 && E < 4 * T) T = 1;

    PyObject *res = PyBytes_FromStringAndSize(NULL,
        (Py_ssize_t)(E * (int64_t)sizeof(int32_t)));
    if (res == NULL) {
        PyBuffer_Release(&pv);
        PyBuffer_Release(&kv);
        PyBuffer_Release(&sv);
        return NULL;
    }
    sr_range ranges[LT_MAX_THREADS];
    pthread_t tids[LT_MAX_THREADS];

    Py_BEGIN_ALLOW_THREADS
    for (int t = 0; t < T; t++) {
        ranges[t].perm = (const int32_t *)pv.buf;
        ranges[t].keys = (const int32_t *)kv.buf;
        ranges[t].starts = (const int32_t *)sv.buf;
        ranges[t].out = (int32_t *)PyBytes_AS_STRING(res);
        ranges[t].lo_i = E * t / T;
        ranges[t].hi_i = E * (t + 1) / T;
        pthread_create(&tids[t], NULL, sr_worker, &ranges[t]);
    }
    for (int t = 0; t < T; t++)
        pthread_join(tids[t], NULL);
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&pv);
    PyBuffer_Release(&kv);
    PyBuffer_Release(&sv);
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
    {"radix_argsort_u64", radix_argsort_u64, METH_VARARGS,
     "radix_argsort_u64(keys: uint64 bytes, nthreads) -> bytes\n"
     "Stable ascending argsort of non-negative 64-bit keys as packed"
     " int32 indices, threaded LSD radix."},
    {"apply_perm_minmax", apply_perm_minmax, METH_VARARGS,
     "apply_perm_minmax(edges (E,2) i32, inv (n,) i32, nthreads)"
     " -> bytes [lo|hi]\n"
     "Threaded inv[edges] relabel + per-edge (min, max)."},
    {"permute_pairs", permute_pairs, METH_VARARGS,
     "permute_pairs(e_lo, e_hi, order, nthreads)"
     " -> (pairs (E,2) i32 bytes, inverse-perm (E,) i32 bytes)\n"
     "Threaded gather of (lo, hi) pairs by a permutation + its inverse."},
    {"scatter_ranks", scatter_ranks, METH_VARARGS,
     "scatter_ranks(perm, keys, starts, nthreads) -> bytes (E,) i32\n"
     "Threaded out[perm[i]] = i - starts[keys[perm[i]]]."},
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
