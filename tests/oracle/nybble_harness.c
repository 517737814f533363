/* Differential-parity harness for the nybble codec.
 *
 * Compiles the UNMODIFIED reference translation unit straight from its
 * read-only mount (no reference code is copied into this repo) with
 * its main() renamed, and exposes nybble_compress / nybble_decompress
 * on files:
 *
 *   nybble_harness c IN OUT   — compress IN (7-bit, NUL-free) to OUT
 *   nybble_harness d IN OUT   — decompress IN to OUT
 *
 * The reference functions printf copious debug output to stdout; the
 * test redirects stdout to /dev/null and reads only OUT.
 *
 * Used by tests/test_nybble_parity.py to prove our encoder is
 * byte-identical to the reference binary on arbitrary inputs.
 */
#define main reference_main_disabled
#include "/root/reference/nybble_compression.c"
#undef main

#include <stdlib.h>

int main(int argc, char **argv) {
    if (argc != 4 || (argv[1][0] != 'c' && argv[1][0] != 'd')) {
        fprintf(stderr, "usage: %s c|d IN OUT\n", argv[0]);
        return 2;
    }
    FILE *in = fopen(argv[2], "rb");
    if (!in) { perror("fopen in"); return 1; }
    fseek(in, 0, SEEK_END);
    long n = ftell(in);
    fseek(in, 0, SEEK_SET);
    char *src = calloc(1, (size_t)n + 1);
    char *dst = calloc(1, 4 * (size_t)n + 4096);
    if (!src || !dst) { fprintf(stderr, "oom\n"); return 1; }
    if (fread(src, 1, (size_t)n, in) != (size_t)n) { perror("fread"); return 1; }
    fclose(in);
    src[n] = '\0';

    if (argv[1][0] == 'c') {
        nybble_compress(src, dst);
    } else {
        nybble_decompress(src, dst);
    }

    FILE *out = fopen(argv[3], "wb");
    if (!out) { perror("fopen out"); return 1; }
    size_t m = strlen(dst);
    if (fwrite(dst, 1, m, out) != m) { perror("fwrite"); return 1; }
    fclose(out);
    return 0;
}
