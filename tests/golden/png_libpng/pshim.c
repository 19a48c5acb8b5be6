/* libpng conformance shim:
 *   pshim enc in.raw out.png color_type bit_depth interlace
 *   pshim dec in.png out.raw
 * in.raw: "W H CHANNELS DEPTH\n" + raw rows, 16-bit big-endian.
 * dec out: int32 w,h,color_type,bit_depth,channels + raw rows
 * (PNG_TRANSFORM_IDENTITY: 16-bit stays big-endian).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <png.h>

static void die(const char *m) { fprintf(stderr, "%s\n", m); exit(2); }

static void do_enc(char **argv) {
    FILE *f = fopen(argv[2], "rb");
    if (!f) die("open in");
    int w, h, ch, depth;
    if (fscanf(f, "%d %d %d %d", &w, &h, &ch, &depth) != 4) die("hdr");
    fgetc(f);
    size_t rowbytes = (size_t)w * ch * (depth / 8);
    png_bytep *rows = malloc(h * sizeof(png_bytep));
    for (int y = 0; y < h; y++) {
        rows[y] = malloc(rowbytes);
        if (fread(rows[y], 1, rowbytes, f) != rowbytes) die("short");
    }
    fclose(f);
    int color_type = atoi(argv[4]);
    int interlace = atoi(argv[6]) ? PNG_INTERLACE_ADAM7
                                  : PNG_INTERLACE_NONE;
    FILE *out = fopen(argv[3], "wb");
    png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING,
                                              NULL, NULL, NULL);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) die("libpng enc");
    png_init_io(png, out);
    png_set_IHDR(png, info, w, h, depth, color_type, interlace,
                 PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
    png_set_rows(png, info, rows);
    png_write_png(png, info, PNG_TRANSFORM_IDENTITY, NULL);
    png_destroy_write_struct(&png, &info);
    fclose(out);
}

static void do_dec(char **argv) {
    FILE *f = fopen(argv[2], "rb");
    if (!f) die("open in");
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                             NULL, NULL, NULL);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) die("libpng dec");
    png_init_io(png, f);
    png_read_png(png, info, PNG_TRANSFORM_IDENTITY, NULL);
    int w = png_get_image_width(png, info);
    int h = png_get_image_height(png, info);
    int ct = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);
    int ch = png_get_channels(png, info);
    size_t rowbytes = png_get_rowbytes(png, info);
    png_bytep *rows = png_get_rows(png, info);
    FILE *out = fopen(argv[3], "wb");
    fwrite(&w, 4, 1, out); fwrite(&h, 4, 1, out);
    fwrite(&ct, 4, 1, out); fwrite(&depth, 4, 1, out);
    fwrite(&ch, 4, 1, out);
    for (int y = 0; y < h; y++) fwrite(rows[y], 1, rowbytes, out);
    fclose(out);
    png_destroy_read_struct(&png, &info, NULL);
    fclose(f);
}

int main(int argc, char **argv) {
    if (argc < 4) die("usage");
    if (!strcmp(argv[1], "enc")) do_enc(argv);
    else if (!strcmp(argv[1], "dec")) do_dec(argv);
    else die("unknown");
    return 0;
}
