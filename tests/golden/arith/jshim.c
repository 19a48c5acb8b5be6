/* Conformance oracle shim around the system libjpeg62-turbo:
 *   jshim enc  in.raw out.jpg quality subsamp restart progressive arith
 *   jshim coef in.jpg out.bin   -- quantized DCT coefficient dump
 *   jshim dec  in.jpg out.raw   -- decoded pixel dump
 * in.raw: ascii header "W H NCOMP\n" then W*H*NCOMP raw bytes.
 * coef dump: int32 ncomp; per comp: int32 wb, hb; int16[hb][wb][64]
 * (natural order). dec dump: int32 W,H,NCOMP; uint8 data.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

static void die(const char *m) { fprintf(stderr, "%s\n", m); exit(2); }

static unsigned char *read_raw(const char *path, int *w, int *h, int *nc) {
    FILE *f = fopen(path, "rb");
    if (!f) die("open in");
    if (fscanf(f, "%d %d %d", w, h, nc) != 3) die("hdr");
    fgetc(f); /* newline */
    size_t n = (size_t)(*w) * (*h) * (*nc);
    unsigned char *buf = malloc(n);
    if (fread(buf, 1, n, f) != n) die("short read");
    fclose(f);
    return buf;
}

static void do_enc(int argc, char **argv) {
    int w, h, nc;
    unsigned char *img = read_raw(argv[2], &w, &h, &nc);
    int quality = atoi(argv[4]);
    const char *sub = argv[5];
    int restart = atoi(argv[6]);
    int progressive = atoi(argv[7]);
    int arith = atoi(argv[8]);
    int nonint = argc > 9 ? atoi(argv[9]) : 0;
    struct jpeg_compress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_compress(&cinfo);
    FILE *out = fopen(argv[3], "wb");
    if (!out) die("open out");
    jpeg_stdio_dest(&cinfo, out);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = nc;
    cinfo.in_color_space = nc == 1 ? JCS_GRAYSCALE : JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    cinfo.arith_code = arith ? TRUE : FALSE;
    cinfo.restart_interval = restart;
    if (nc == 3) {
        if (!strcmp(sub, "h1v1")) {
            cinfo.comp_info[0].h_samp_factor = 1;
            cinfo.comp_info[0].v_samp_factor = 1;
        } else if (!strcmp(sub, "h2v1")) {
            cinfo.comp_info[0].h_samp_factor = 2;
            cinfo.comp_info[0].v_samp_factor = 1;
        } /* default h2v2 */
    }
    if (progressive)
        jpeg_simple_progression(&cinfo);
    if (nonint) {
        /* sequential but non-interleaved: one full-band scan per
         * component (Ss=0, Se=63, Ah=Al=0) */
        static jpeg_scan_info scans[4];
        for (int ci = 0; ci < nc; ci++) {
            scans[ci].comps_in_scan = 1;
            scans[ci].component_index[0] = ci;
            scans[ci].Ss = 0; scans[ci].Se = 63;
            scans[ci].Ah = 0; scans[ci].Al = 0;
        }
        cinfo.scan_info = scans;
        cinfo.num_scans = nc;
    }
    jpeg_start_compress(&cinfo, TRUE);
    while (cinfo.next_scanline < cinfo.image_height) {
        JSAMPROW row = img + (size_t)cinfo.next_scanline * w * nc;
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    fclose(out);
    free(img);
}

static void do_coef(int argc, char **argv) {
    struct jpeg_decompress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    FILE *in = fopen(argv[2], "rb");
    if (!in) die("open in");
    jpeg_stdio_src(&cinfo, in);
    jpeg_read_header(&cinfo, TRUE);
    jvirt_barray_ptr *coefs = jpeg_read_coefficients(&cinfo);
    FILE *out = fopen(argv[3], "wb");
    int nc = cinfo.num_components;
    fwrite(&nc, 4, 1, out);
    for (int ci = 0; ci < nc; ci++) {
        jpeg_component_info *comp = &cinfo.comp_info[ci];
        int wb = comp->width_in_blocks, hb = comp->height_in_blocks;
        fwrite(&wb, 4, 1, out);
        fwrite(&hb, 4, 1, out);
        for (int br = 0; br < hb; br++) {
            JBLOCKARRAY rows = (cinfo.mem->access_virt_barray)(
                (j_common_ptr)&cinfo, coefs[ci], br, 1, FALSE);
            fwrite(rows[0], sizeof(JBLOCK), wb, out);
        }
    }
    fclose(out);
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(in);
}

static void do_dec(int argc, char **argv) {
    struct jpeg_decompress_struct cinfo;
    struct jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    FILE *in = fopen(argv[2], "rb");
    if (!in) die("open in");
    jpeg_stdio_src(&cinfo, in);
    jpeg_read_header(&cinfo, TRUE);
    jpeg_start_decompress(&cinfo);
    int w = cinfo.output_width, h = cinfo.output_height,
        nc = cinfo.output_components;
    FILE *out = fopen(argv[3], "wb");
    fwrite(&w, 4, 1, out);
    fwrite(&h, 4, 1, out);
    fwrite(&nc, 4, 1, out);
    unsigned char *row = malloc((size_t)w * nc);
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW r = row;
        jpeg_read_scanlines(&cinfo, &r, 1);
        fwrite(row, 1, (size_t)w * nc, out);
    }
    free(row);
    fclose(out);
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(in);
}

int main(int argc, char **argv) {
    if (argc < 2) die("usage");
    if (!strcmp(argv[1], "enc")) do_enc(argc, argv);
    else if (!strcmp(argv[1], "coef")) do_coef(argc, argv);
    else if (!strcmp(argv[1], "dec")) do_dec(argc, argv);
    else die("unknown cmd");
    return 0;
}
