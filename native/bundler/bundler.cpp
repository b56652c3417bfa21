// bundler — MPI-Sintel submission packer, byte-compatible with the official
// prebuilt binary shipped by the reference (/root/reference/bundler/linux-x64;
// usage spec in README_BUNDLER.txt:66-82).  The container this tool emits
// decompresses to the exact byte stream the official binary produces; the
// format below was verified against it end-to-end (tests/test_bundler.py runs
// both on the same inputs and asserts decompressed-byte equality).
//
// Usage: bundler DIR_CLEAN DIR_FINAL OUTFILE
//
// Container (LZMA_ALONE-compressed, all integers little-endian u32):
//   header (68 bytes):
//     w | h | ndirs (=2*nseq) | total_samples | nseq (=12)
//     nseq per-sequence sample counts, sequences in sorted-name order
//     (std::set order: "PERTURBED_*" sorts before lowercase names)
//   canonical frames, for pass in (clean, final) x sequence in sorted order:
//     u-plane (w*h f32) then v-plane (w*h f32) of that sequence's canonical
//     frame (fixed per-sequence frame index, table below)
//   samples, for pass x sequence (sorted) x frame f (name-sorted, 0-based):
//     for every pixel j in row-major order with sel[j] == f % 10:
//       f32 u[j] | f32 v[j]
//
// The "fixed, randomized subsample" selector sel[w*h] in {0..9} is one draw
// of Numerical Recipes ran0 (Park-Miller minimal standard with the XOR-MASK
// guard; 64-bit state) seeded with 0x14224cb, one warm-up call discarded:
//   sel[j] = (int)floorf((float)(state_j / 2147483647.0) * 10.0f)
// Per-sequence sample counts follow from the selector residue histogram and
// the frame count (e.g. 40 frames -> exactly 4 * w * h / 10 on average ->
// 4 * sum(all residues) = 4 * w * h).

#include <lzma.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <string>
#include <sys/stat.h>
#include <vector>

namespace {

constexpr float kFloMagic = 202021.25f;

// ---------------------------------------------------------------------------
// Sintel test-set table: {sequence, flo frame count, 0-based canonical frame}.
// Counts are validated exactly, as the official binary does; canonical frame
// indices were measured from its output (tracer run, 2026-08-18).
// ---------------------------------------------------------------------------
struct SeqSpec {
  const char* name;
  int nframes;
  int canonical;
};
// Sorted-name order (capital 'P' < lowercase).
constexpr SeqSpec kSeqs[] = {
    {"PERTURBED_market_3", 49, 21}, {"PERTURBED_shaman_1", 49, 22},
    {"ambush_1", 22, 20},           {"ambush_3", 40, 24},
    {"bamboo_3", 49, 29},           {"cave_3", 49, 15},
    {"market_1", 49, 17},           {"market_4", 49, 46},
    {"mountain_2", 49, 43},         {"temple_1", 49, 23},
    {"tiger", 49, 39},              {"wall", 49, 39},
};
constexpr int kNumSeqs = sizeof(kSeqs) / sizeof(kSeqs[0]);
constexpr int64_t kSelectorSeed = 0x14224cb;  // 21111499

// ---------------------------------------------------------------------------
// Numerical Recipes ran0 on 64-bit state (matches the official binary's
// inlined copy instruction-for-instruction: double AM product, float result).
// ---------------------------------------------------------------------------
float Ran0(int64_t* state) {
  constexpr int64_t IA = 16807, IM = 2147483647, IQ = 127773, IR = 2836;
  constexpr int64_t MASK = 123459876;
  *state ^= MASK;
  int64_t k = *state / IQ;  // C division truncates toward zero
  *state = IA * (*state - k * IQ) - IR * k;
  if (*state < 0) *state += IM;
  float ans = float(double(*state) * (1.0 / 2147483647.0));
  *state ^= MASK;
  return ans;
}

std::vector<int> GenerateSelector(int w, int h, int64_t seed) {
  int64_t state = seed;
  Ran0(&state);  // warm-up draw, discarded
  std::vector<int> sel(size_t(w) * h);
  for (auto& v : sel) v = int(floorf(Ran0(&state) * 10.0f));
  return sel;
}

// ---------------------------------------------------------------------------
// .flo I/O (planar split on read: the container stores planes, not pairs)
// ---------------------------------------------------------------------------
struct Flow {
  int32_t w = 0, h = 0;
  std::vector<float> u, v;
};

bool ReadFlo(const std::string& path, Flow* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  float magic;
  int32_t w, h;
  if (fread(&magic, 4, 1, f) != 1 || magic != kFloMagic ||
      fread(&w, 4, 1, f) != 1 || fread(&h, 4, 1, f) != 1 || w <= 0 || h <= 0) {
    fclose(f);
    return false;
  }
  size_t n = size_t(w) * h;
  std::vector<float> inter(n * 2);
  if (fread(inter.data(), 4, n * 2, f) != n * 2) {
    fclose(f);
    return false;
  }
  fclose(f);
  out->w = w;
  out->h = h;
  out->u.resize(n);
  out->v.resize(n);
  for (size_t i = 0; i < n; ++i) {
    out->u[i] = inter[2 * i];
    out->v[i] = inter[2 * i + 1];
  }
  return true;
}

std::vector<std::string> ListFloFiles(const std::string& dir) {
  std::vector<std::string> out;
  DIR* d = opendir(dir.c_str());
  if (!d) return out;
  while (dirent* e = readdir(d)) {
    std::string name = e->d_name;
    if (name.size() >= 4 && name.substr(name.size() - 4) == ".flo")
      out.push_back(name);
  }
  closedir(d);
  std::sort(out.begin(), out.end());
  return out;
}

// ---------------------------------------------------------------------------
// Output: buffered container + LZMA_ALONE compression (decoder-compatible
// with the official 7-zip-SDK stream; the *decompressed* bytes are identical,
// which is what the evaluation site consumes).
// ---------------------------------------------------------------------------
class Writer {
 public:
  void U32(uint32_t v) { Raw(&v, 4); }
  void F32(float v) { Raw(&v, 4); }
  void F32s(const float* p, size_t n) { Raw(p, n * 4); }
  void Raw(const void* p, size_t n) {
    const auto* b = static_cast<const uint8_t*>(p);
    buf_.insert(buf_.end(), b, b + n);
  }
  const std::vector<uint8_t>& buf() const { return buf_; }

 private:
  std::vector<uint8_t> buf_;
};

bool LzmaAloneToFile(const std::vector<uint8_t>& in, const char* path) {
  lzma_options_lzma opt;
  if (lzma_lzma_preset(&opt, 6)) {
    fprintf(stderr, "lzma preset failed\n");
    return false;
  }
  opt.dict_size = 1u << 24;  // 16 MB, as the official stream advertises
  lzma_stream strm = LZMA_STREAM_INIT;
  if (lzma_alone_encoder(&strm, &opt) != LZMA_OK) {
    fprintf(stderr, "lzma_alone_encoder init failed\n");
    return false;
  }
  FILE* f = fopen(path, "wb");
  if (!f) {
    lzma_end(&strm);
    return false;
  }
  std::vector<uint8_t> outbuf(1 << 20);
  strm.next_in = in.data();
  strm.avail_in = in.size();
  lzma_ret r = LZMA_OK;
  do {
    strm.next_out = outbuf.data();
    strm.avail_out = outbuf.size();
    r = lzma_code(&strm, LZMA_FINISH);
    if (r != LZMA_OK && r != LZMA_STREAM_END) {
      fprintf(stderr, "lzma error %d\n", int(r));
      fclose(f);
      lzma_end(&strm);
      return false;
    }
    fwrite(outbuf.data(), 1, outbuf.size() - strm.avail_out, f);
  } while (r != LZMA_STREAM_END);
  fclose(f);
  lzma_end(&strm);
  printf("wrote %s: %zu -> container\n", path, in.size());
  return true;
}

struct Pass {
  std::string dir;
  // frames[seq][frame] = filename
  std::vector<std::vector<std::string>> frames;
};

bool VerifyPass(Pass* pass) {
  pass->frames.resize(kNumSeqs);
  for (int s = 0; s < kNumSeqs; ++s) {
    std::string d = pass->dir + "/" + kSeqs[s].name;
    auto files = ListFloFiles(d);
    if (int(files.size()) != kSeqs[s].nframes) {
      fprintf(stderr,
              "ERROR: Directory %s has wrong number of entries (%zu, should "
              "be %d)\n",
              kSeqs[s].name, files.size(), kSeqs[s].nframes);
      return false;
    }
    pass->frames[s] = std::move(files);
  }
  return true;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 4) {
    fprintf(stderr, "usage: bundler DIR_CLEAN DIR_FINAL OUTFILE\n");
    return 2;
  }
  Pass passes[2] = {{argv[1], {}}, {argv[2], {}}};
  printf("Step 1: Verifying subdirectories");
  for (auto& p : passes)
    if (!VerifyPass(&p)) return 1;
  printf("done.\n");

  // Dimensions from the first frame of the first sequence of the clean pass.
  Flow probe;
  if (!ReadFlo(passes[0].dir + "/" + kSeqs[0].name + "/" +
                   passes[0].frames[0][0],
               &probe)) {
    fprintf(stderr, "ERROR: cannot read first .flo file\n");
    return 1;
  }
  const int w = probe.w, h = probe.h;
  const size_t npix = size_t(w) * h;

  auto sel = GenerateSelector(w, h, kSelectorSeed);
  // Residue histogram -> per-sequence and total sample counts.
  uint64_t residue_count[10] = {0};
  for (int v : sel)
    if (v >= 0 && v < 10) ++residue_count[v];
  std::vector<uint32_t> seq_samples(kNumSeqs);
  uint64_t total = 0;
  for (int s = 0; s < kNumSeqs; ++s) {
    uint64_t c = 0;
    for (int f = 0; f < kSeqs[s].nframes; ++f) c += residue_count[f % 10];
    seq_samples[s] = uint32_t(c);
    total += c;
  }
  total *= 2;  // both passes

  Writer out;
  out.U32(uint32_t(w));
  out.U32(uint32_t(h));
  out.U32(uint32_t(2 * kNumSeqs));
  out.U32(uint32_t(total));
  out.U32(uint32_t(kNumSeqs));
  for (int s = 0; s < kNumSeqs; ++s) out.U32(seq_samples[s]);

  printf("Step 2: Adding canonical frames");
  fflush(stdout);
  for (const auto& pass : passes) {
    for (int s = 0; s < kNumSeqs; ++s) {
      Flow flo;
      std::string path = pass.dir + "/" + kSeqs[s].name + "/" +
                         pass.frames[s][kSeqs[s].canonical];
      if (!ReadFlo(path, &flo) || flo.w != w || flo.h != h) {
        fprintf(stderr, "ERROR: bad canonical frame %s\n", path.c_str());
        return 1;
      }
      out.F32s(flo.u.data(), npix);
      out.F32s(flo.v.data(), npix);
      printf(".");
      fflush(stdout);
    }
  }
  printf("done.\n");

  printf("Step 3: Adding subsampled datapoints");
  fflush(stdout);
  for (const auto& pass : passes) {
    for (int s = 0; s < kNumSeqs; ++s) {
      for (int f = 0; f < kSeqs[s].nframes; ++f) {
        Flow flo;
        std::string path =
            pass.dir + "/" + kSeqs[s].name + "/" + pass.frames[s][f];
        if (!ReadFlo(path, &flo) || flo.w != w || flo.h != h) {
          fprintf(stderr, "ERROR: bad frame %s\n", path.c_str());
          return 1;
        }
        const int res = f % 10;
        for (size_t j = 0; j < npix; ++j) {
          if (sel[j] == res) {
            out.F32(flo.u[j]);
            out.F32(flo.v[j]);
          }
        }
      }
      printf(".");
      fflush(stdout);
    }
  }
  printf("done.\n");

  printf("Step 4: Compressing file\n");
  return LzmaAloneToFile(out.buf(), argv[3]) ? 0 : 1;
}
