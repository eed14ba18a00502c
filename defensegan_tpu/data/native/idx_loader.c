/* Native data-plane: IDX (MNIST wire format) parser + multithreaded
 * uint8 -> float32 [0,1] normalization.
 *
 * The reference (kabkabm/defensegan, datasets/mnist.py) parses IDX in
 * Python; at ImageNet-64-scale streaming this becomes host-bound, so the
 * rebuild keeps a native loader for the host data plane (the TPU compute
 * plane is XLA/Pallas). Exposed via ctypes (no pybind11 in this image);
 * Python falls back to the numpy parser when the shared object is missing.
 *
 * Build: cc -O3 -fPIC -shared -pthread idx_loader.c -o libidx_loader.so
 */

#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef struct {
    const uint8_t *src;
    float *dst;
    size_t begin;
    size_t end;
    float scale;
} norm_task_t;

static void *norm_worker(void *arg) {
    norm_task_t *t = (norm_task_t *)arg;
    const uint8_t *s = t->src;
    float *d = t->dst;
    const float k = t->scale;
    for (size_t i = t->begin; i < t->end; ++i) {
        d[i] = (float)s[i] * k;
    }
    return NULL;
}

/* Normalize uint8 -> float32 * scale across `nthreads` threads. */
int idx_normalize_u8(const uint8_t *src, float *dst, size_t n, float scale,
                     int nthreads) {
    if (nthreads < 1) nthreads = 1;
    if (nthreads > 64) nthreads = 64;
    if ((size_t)nthreads > n) nthreads = (int)(n ? n : 1);
    pthread_t threads[64];
    norm_task_t tasks[64];
    size_t chunk = n / (size_t)nthreads;
    for (int i = 0; i < nthreads; ++i) {
        tasks[i].src = src;
        tasks[i].dst = dst;
        tasks[i].begin = (size_t)i * chunk;
        tasks[i].end = (i == nthreads - 1) ? n : (size_t)(i + 1) * chunk;
        tasks[i].scale = scale;
        if (pthread_create(&threads[i], NULL, norm_worker, &tasks[i]) != 0) {
            for (int j = 0; j < i; ++j) pthread_join(threads[j], NULL);
            return -1;
        }
    }
    for (int i = 0; i < nthreads; ++i) pthread_join(threads[i], NULL);
    return 0;
}

/* Parse an (uncompressed) IDX header: returns ndim and fills dims[8];
 * returns -1 on bad magic, -2 on unsupported dtype (only u8 supported
 * here; other dtypes go through the Python fallback). The payload begins
 * at offset 4 + 4*ndim. */
int idx_parse_header(const uint8_t *buf, size_t len, int64_t *dims,
                     int *dtype_code) {
    if (len < 4 || buf[0] != 0 || buf[1] != 0) return -1;
    *dtype_code = buf[2];
    int ndim = buf[3];
    if (ndim < 1 || ndim > 8) return -1;
    if (len < 4 + 4 * (size_t)ndim) return -1;
    for (int i = 0; i < ndim; ++i) {
        const uint8_t *p = buf + 4 + 4 * i;
        dims[i] = ((int64_t)p[0] << 24) | ((int64_t)p[1] << 16) |
                  ((int64_t)p[2] << 8) | (int64_t)p[3];
    }
    return ndim;
}
