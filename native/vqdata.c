/* vqdata — native data-loading runtime for vqtpu examples/training.
 *
 * The reference delegates IO to torchvision; the TPU-native equivalent is a
 * small C runtime: an mmap'd IDX (MNIST-format) reader and a fused
 * gather+normalize batch kernel that writes float32 in [-1, 1] directly
 * into a caller-provided buffer (one pass, no intermediate uint8->float
 * arrays like the numpy path). Exposed to Python via ctypes
 * (vqtpu/models/native_data.py); built by vqtpu/models/native_build.py
 * with the system cc.
 *
 * IDX format: big-endian magic (0x00000803 = uint8 rank-3 images),
 * dims, then raw data.
 */

#include <fcntl.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

typedef struct {
    void    *map;       /* whole-file mapping */
    size_t   map_len;
    const uint8_t *data;  /* first pixel */
    int64_t  count;     /* number of images */
    int64_t  rows;
    int64_t  cols;
} vq_idx;

static uint32_t be32(const uint8_t *p) {
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
           ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}

/* returns NULL on any failure; caller frees with vq_idx_close */
vq_idx *vq_idx_open(const char *path) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return NULL;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size < 16) { close(fd); return NULL; }
    void *map = mmap(NULL, (size_t)st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    close(fd);
    if (map == MAP_FAILED) return NULL;

    const uint8_t *p = (const uint8_t *)map;
    if (be32(p) != 0x00000803u) { munmap(map, (size_t)st.st_size); return NULL; }
    int64_t count = (int64_t)be32(p + 4);
    int64_t rows = (int64_t)be32(p + 8);
    int64_t cols = (int64_t)be32(p + 12);
    /* the three fields are untrusted 32-bit values: bound them individually
     * and check the products with overflow-aware multiplies, otherwise a
     * crafted header can overflow int64 and bypass the file-size check
     * (out-of-bounds reads in vq_idx_gather_f32) */
    int64_t px, total;
    if (count <= 0 || rows <= 0 || cols <= 0 ||
        rows > (1 << 16) || cols > (1 << 16) ||
        __builtin_mul_overflow(rows, cols, &px) ||
        __builtin_mul_overflow(count, px, &total) ||
        total > INT64_MAX - 16 ||
        (int64_t)st.st_size < 16 + total) {
        munmap(map, (size_t)st.st_size);
        return NULL;
    }

    vq_idx *h = (vq_idx *)malloc(sizeof(vq_idx));
    if (!h) { munmap(map, (size_t)st.st_size); return NULL; }
    h->map = map;
    h->map_len = (size_t)st.st_size;
    h->data = p + 16;
    h->count = count;
    h->rows = rows;
    h->cols = cols;
    return h;
}

int64_t vq_idx_count(const vq_idx *h) { return h ? h->count : -1; }
int64_t vq_idx_rows(const vq_idx *h)  { return h ? h->rows : -1; }
int64_t vq_idx_cols(const vq_idx *h)  { return h ? h->cols : -1; }

void vq_idx_close(vq_idx *h) {
    if (!h) return;
    munmap(h->map, h->map_len);
    free(h);
}

/* Gather `batch` images by index and write normalized float32 in [-1, 1]
 * (x/255 * 2 - 1, matching examples/common data normalization) into `dst`
 * of shape (batch, rows*cols). Returns 0 on success, -1 on a bad index. */
int vq_idx_gather_f32(const vq_idx *h, const int64_t *indices, int64_t batch,
                      float *dst) {
    if (!h) return -1;
    const int64_t px = h->rows * h->cols;
    /* 256-entry LUT: uint8 -> normalized float (one multiply-add per entry,
     * hoisted out of the hot loop) */
    float lut[256];
    for (int v = 0; v < 256; v++) lut[v] = (float)v * (2.0f / 255.0f) - 1.0f;

    for (int64_t b = 0; b < batch; b++) {
        int64_t idx = indices[b];
        if (idx < 0 || idx >= h->count) return -1;
        const uint8_t *src = h->data + idx * px;
        float *out = dst + b * px;
        for (int64_t i = 0; i < px; i++) out[i] = lut[src[i]];
    }
    return 0;
}
