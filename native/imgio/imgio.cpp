// craft_imgio: native image decode core for the input pipeline.
//
// The reference feeds each GPU from 4 torch DataLoader worker processes whose
// decode path is libpng/libjpeg through PIL (core/datasets.py:569-577).  This
// module is the TPU-side native equivalent: PNG (8/16-bit, via libpng16),
// JPEG (libjpeg), and binary PPM/PGM decoded straight into a Python
// bytes buffer with no PIL object layer — the Python wrapper
// (craft_tpu/data/imgio.py) views it as numpy [H, W, C] without a copy.
//
// CPython C API only (no pybind11/numpy headers in this image).  Build:
// native/imgio/Makefile -> craft_imgio.so importable from the repo root.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Decoded {
  std::string data;   // raw pixels, row-major
  long h = 0, w = 0, channels = 0;
  int bytes_per_sample = 1;  // 1 = uint8, 2 = uint16 (native endian)
};

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

struct PngReadState {
  const unsigned char* buf;
  size_t len;
  size_t pos;
};

void png_read_cb(png_structp png, png_bytep out, png_size_t n) {
  auto* st = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (st->pos + n > st->len) {
    png_error(png, "truncated PNG");
  }
  std::memcpy(out, st->buf + st->pos, n);
  st->pos += n;
}

bool decode_png(const unsigned char* buf, size_t len, Decoded* out,
                std::string* err) {
  if (len < 8 || png_sig_cmp(buf, 0, 8)) {
    *err = "not a PNG";
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info) {
    *err = "libpng alloc failed";
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  // Declared BEFORE setjmp: a libpng error longjmps back here, and the
  // error-path return then runs this destructor normally (declaring it
  // after the setjmp point would skip it and leak the row-pointer array).
  std::vector<png_bytep> rows;
  if (setjmp(png_jmpbuf(png))) {
    *err = "libpng decode error";
    out->data.clear();  // don't leave a half-decoded buffer behind
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadState st{buf, len, 0};
  png_set_read_fn(png, &st, png_read_cb);
  png_read_info(png, info);

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);

  // Palette images: return the raw indices (PIL parity —
  // np.array(Image.open(p)) on a mode-'P' image yields [H, W] uint8
  // indices, not expanded RGB).  Sub-byte packed indices are expanded to
  // one byte per pixel, as PIL does.
  if (color_type == PNG_COLOR_TYPE_PALETTE && bit_depth < 8)
    png_set_packing(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (color_type != PNG_COLOR_TYPE_PALETTE &&
      png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_swap(png);  // PNG is big-endian on disk
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  int bps = png_get_bit_depth(png, info) == 16 ? 2 : 1;
  size_t stride = static_cast<size_t>(w) * channels * bps;
  out->data.resize(stride * h);
  rows.resize(h);
  for (png_uint_32 r = 0; r < h; ++r)
    rows[r] = reinterpret_cast<png_bytep>(&out->data[r * stride]);
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);

  out->h = h;
  out->w = w;
  out->channels = channels;
  out->bytes_per_sample = bps;
  return true;
}

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jmp, 1);
}

bool decode_jpeg(const unsigned char* buf, size_t len, Decoded* out,
                 std::string* err) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    *err = "libjpeg decode error";
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  int channels = cinfo.output_components;
  size_t stride = static_cast<size_t>(cinfo.output_width) * channels;
  out->data.resize(stride * cinfo.output_height);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = reinterpret_cast<JSAMPROW>(
        &out->data[cinfo.output_scanline * stride]);
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->channels = channels;
  out->bytes_per_sample = 1;
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------------------
// Binary PPM (P6) / PGM (P5)
// ---------------------------------------------------------------------------

bool decode_pnm(const unsigned char* buf, size_t len, Decoded* out,
                std::string* err) {
  if (len < 2 || buf[0] != 'P' || (buf[1] != '5' && buf[1] != '6')) {
    *err = "not a binary PNM";
    return false;
  }
  int channels = buf[1] == '6' ? 3 : 1;
  size_t pos = 2;
  long vals[3];  // w, h, maxval
  for (int v = 0; v < 3; ++v) {
    // skip whitespace and '#' comments
    while (pos < len) {
      if (buf[pos] == '#') {
        while (pos < len && buf[pos] != '\n') ++pos;
      } else if (std::isspace(buf[pos])) {
        ++pos;
      } else {
        break;
      }
    }
    long x = 0;
    bool any = false;
    while (pos < len && std::isdigit(buf[pos])) {
      x = x * 10 + (buf[pos++] - '0');
      any = true;
    }
    if (!any) {
      *err = "bad PNM header";
      return false;
    }
    vals[v] = x;
  }
  ++pos;  // single whitespace after maxval
  int bps = vals[2] > 255 ? 2 : 1;
  size_t need = static_cast<size_t>(vals[0]) * vals[1] * channels * bps;
  if (pos + need > len) {
    *err = "truncated PNM";
    return false;
  }
  out->data.assign(reinterpret_cast<const char*>(buf + pos), need);
  if (bps == 2) {  // big-endian on disk -> native little-endian
    auto* p = reinterpret_cast<unsigned char*>(&out->data[0]);
    for (size_t i = 0; i + 1 < need; i += 2) std::swap(p[i], p[i + 1]);
  }
  out->h = vals[1];
  out->w = vals[0];
  out->channels = channels;
  out->bytes_per_sample = bps;
  return true;
}

// ---------------------------------------------------------------------------
// Python binding
// ---------------------------------------------------------------------------

PyObject* py_decode(PyObject*, PyObject* args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return nullptr;
  const auto* buf = static_cast<const unsigned char*>(view.buf);
  size_t len = static_cast<size_t>(view.len);

  Decoded dec;
  std::string err;
  bool ok;
  Py_BEGIN_ALLOW_THREADS
  if (len >= 8 && !png_sig_cmp(buf, 0, 8)) {
    ok = decode_png(buf, len, &dec, &err);
  } else if (len >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) {
    ok = decode_jpeg(buf, len, &dec, &err);
  } else {
    ok = decode_pnm(buf, len, &dec, &err);
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }
  // bytearray (not bytes): np.frombuffer over it yields a WRITABLE array,
  // keeping the "same arrays as PIL" contract in the Python wrapper.
  PyObject* data = PyByteArray_FromStringAndSize(dec.data.data(),
                                                 (Py_ssize_t)dec.data.size());
  if (!data) return nullptr;
  return Py_BuildValue("(Nllli)", data, dec.h, dec.w, dec.channels,
                       dec.bytes_per_sample);
}

PyMethodDef methods[] = {
    {"decode", py_decode, METH_VARARGS,
     "decode(bytes) -> (pixels: bytearray, h, w, channels, bytes_per_sample)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "craft_imgio",
    "Native PNG/JPEG/PNM decode core for the craft_tpu input pipeline.",
    -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit_craft_imgio() { return PyModule_Create(&moduledef); }
