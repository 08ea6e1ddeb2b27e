/* Huff0 size oracle: compress stdin blockwise with zstd's real Huff0
   (HUF_compress1X_repeat, fresh table per block) and print per-block
   compressed sizes. Usage: huf0_size <block_size> < data
   Output: one line per block: "<raw_n> <huf_size>" where huf_size==0
   means Huff0 judged the block uncompressible/RLE (stored). */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

typedef enum { HUF_repeat_none=0, HUF_repeat_check=1, HUF_repeat_valid=2 } HUF_repeat;
/* zstd 1.5.4 signatures (flags-consolidated API) */
extern size_t HUF_compress1X_repeat(void* dst, size_t dstSize,
    const void* src, size_t srcSize, unsigned maxSymbolValue,
    unsigned huffLog, void* workSpace, size_t wkspSize,
    void* hufTable, HUF_repeat* repeat, int flags);
extern size_t HUF_compressBound(size_t size);
extern unsigned HUF_isError(size_t code);
extern const char* HUF_getErrorName(size_t code);

int main(int argc, char** argv) {
    size_t bs = argc > 1 ? (size_t)atol(argv[1]) : 65536;
    if (bs == 0 || bs > 131072) { fprintf(stderr, "block size 1..131072\n"); return 2; }
    unsigned char* src = malloc(bs);
    size_t cap = HUF_compressBound(bs) + 64;
    unsigned char* dst = malloc(cap);
    /* HUF_WORKSPACE_SIZE (1.5.4) = (8<<10)+512; oversize for safety */
    static unsigned char wksp[1u<<15];
    static size_t ctable[260];
    size_t n;
    while ((n = fread(src, 1, bs, stdin)) > 0) {
        HUF_repeat rep = HUF_repeat_none;
        memset(ctable, 0, sizeof ctable);
        size_t r = HUF_compress1X_repeat(dst, cap, src, n, 255, 11,
                                         wksp, sizeof wksp, ctable, &rep, 0);
        if (HUF_isError(r)) { fprintf(stderr, "HUF error: %s\n", HUF_getErrorName(r)); return 3; }
        printf("%zu %zu\n", n, r);
    }
    return 0;
}
