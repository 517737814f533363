/* Differential-parity harness for the "small" context-LZW codecs.
 *
 * Compiles the UNMODIFIED reference translation unit straight from its
 * read-only mount (no reference code is copied into this repo) with
 * its main() renamed, and exposes every small_compression.c entry
 * point that actually runs (the real scheme-A encoder is stubbed in
 * the reference; its decoders and mock encoders work —
 * small_compression.c:1771-1876 exercises them 4/4):
 *
 *   small_harness db IN OUT  — scheme A decoder  (decompress_bytestring :453)
 *   small_harness mb IN OUT  — scheme A mock encoder (test_compress_bytestring :688)
 *   small_harness cb IN OUT  — scheme A hard-wired encoder (compress_bytestring :582)
 *   small_harness dn IN OUT  — scheme B decoder  (decompress :1432)
 *   small_harness tb IN OUT  — scheme B byte-as-index mock (test_byte_compress :1667)
 *   small_harness cn IN OUT  — scheme B real greedy encoder (compress :1588)
 *
 * The reference functions printf copious debug output to stdout; the
 * test redirects stdout to /dev/null and reads only OUT.  All
 * reference APIs are NUL-terminated-string based, so inputs must be
 * NUL-free (the tests generate 7-bit NUL-free corpora).
 */
#define main reference_main_disabled
#include "/root/reference/small_compression.c"
#undef main

#include <stdlib.h>

int main(int argc, char **argv) {
    if (argc != 4) {
        fprintf(stderr, "usage: %s db|mb|cb|dn|tb|cn IN OUT\n", argv[0]);
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

    const char *mode = argv[1];
    if (!strcmp(mode, "db")) {
        decompress_bytestring(src, dst);
    } else if (!strcmp(mode, "mb")) {
        test_compress_bytestring(src, dst);
    } else if (!strcmp(mode, "cb")) {
        compress_bytestring(src, dst);
    } else if (!strcmp(mode, "dn")) {
        decompress(src, dst);
    } else if (!strcmp(mode, "tb")) {
        test_byte_compress(src, dst);
    } else if (!strcmp(mode, "cn")) {
        compress(src, dst);
    } else {
        fprintf(stderr, "bad mode %s\n", mode);
        return 2;
    }

    FILE *out = fopen(argv[3], "wb");
    if (!out) { perror("fopen out"); return 1; }
    size_t m = strlen(dst);
    if (fwrite(dst, 1, m, out) != m) { perror("fwrite"); return 1; }
    fclose(out);
    return 0;
}
