// bundler — MPI-Sintel submission packer (C++ reimplementation of the
// reference's prebuilt third-party binary; see
// /root/reference/bundler/README_BUNDLER.txt:10-26 for the three-step spec:
// canonical frames + fixed randomized subsample + LZMA compression).
//
// The official binary's container layout is undocumented, so this tool writes
// a *documented* versioned container (magic CTB1) implementing the same three
// steps; a Python reader lives in craft_tpu/utils/bundle.py.  For actual
// leaderboard upload the official binary must be used — this tool covers the
// packaging capability inside the framework (archive + transport + integrity).
//
// Usage: bundler DIR_CLEAN DIR_FINAL OUTFILE [subsample_stride=16] [seed=1234]
//
// Container (before LZMA):
//   "CTB1" | u32 version | u32 npass
//   per pass: u32 nseq
//     per seq: u32 name_len | name | u32 nframes
//       canonical (first) frame: u32 w | u32 h | w*h*2 f32 (u,v)
//       per frame: u32 name_len | name | u32 w | u32 h | u32 nsamples
//         nsamples * { u32 pixel_index | f32 u | f32 v }
//   Sample indices come from a seeded LCG so every run of the tool picks the
//   same "fixed, randomized subsample".
// The whole container is compressed with xz (LZMA2, preset 6).

#include <lzma.h>

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <string>
#include <sys/stat.h>
#include <vector>

namespace {

constexpr float kFloMagic = 202021.25f;

struct Flow {
  uint32_t w = 0, h = 0;
  std::vector<float> data;  // interleaved u,v
};

bool ReadFlo(const std::string& path, Flow* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  float magic;
  int32_t w, h;
  if (fread(&magic, 4, 1, f) != 1 || magic != kFloMagic ||
      fread(&w, 4, 1, f) != 1 || fread(&h, 4, 1, f) != 1) {
    fclose(f);
    return false;
  }
  out->w = w;
  out->h = h;
  out->data.resize(size_t(w) * h * 2);
  size_t n = fread(out->data.data(), 4, out->data.size(), f);
  fclose(f);
  return n == out->data.size();
}

std::vector<std::string> ListDir(const std::string& dir, bool dirs_only) {
  std::vector<std::string> out;
  DIR* d = opendir(dir.c_str());
  if (!d) return out;
  while (dirent* e = readdir(d)) {
    std::string name = e->d_name;
    if (name == "." || name == "..") continue;
    struct stat st;
    if (stat((dir + "/" + name).c_str(), &st) != 0) continue;
    if (dirs_only == !!S_ISDIR(st.st_mode)) out.push_back(name);
  }
  closedir(d);
  std::sort(out.begin(), out.end());
  return out;
}

class Writer {
 public:
  void U32(uint32_t v) { Raw(&v, 4); }
  void F32(float v) { Raw(&v, 4); }
  void Str(const std::string& s) {
    U32(uint32_t(s.size()));
    Raw(s.data(), s.size());
  }
  void Raw(const void* p, size_t n) {
    const auto* b = static_cast<const uint8_t*>(p);
    buf_.insert(buf_.end(), b, b + n);
  }
  const std::vector<uint8_t>& buf() const { return buf_; }

 private:
  std::vector<uint8_t> buf_;
};

// Deterministic LCG (numerical recipes constants) for the fixed subsample.
struct Lcg {
  uint64_t s;
  explicit Lcg(uint64_t seed) : s(seed) {}
  uint32_t Next() {
    s = s * 6364136223846793005ULL + 1442695040888963407ULL;
    return uint32_t(s >> 33);
  }
};

bool PackPass(const std::string& dir, uint32_t stride, uint64_t seed,
              Writer* w) {
  auto seqs = ListDir(dir, /*dirs_only=*/true);
  if (seqs.empty()) {
    fprintf(stderr, "no sequence directories under %s\n", dir.c_str());
    return false;
  }
  w->U32(uint32_t(seqs.size()));
  for (const auto& seq : seqs) {
    auto frames = ListDir(dir + "/" + seq, /*dirs_only=*/false);
    frames.erase(std::remove_if(frames.begin(), frames.end(),
                                [](const std::string& n) {
                                  return n.size() < 4 ||
                                         n.substr(n.size() - 4) != ".flo";
                                }),
                 frames.end());
    if (frames.empty()) {
      fprintf(stderr, "no .flo files in %s/%s\n", dir.c_str(), seq.c_str());
      return false;
    }
    w->Str(seq);
    w->U32(uint32_t(frames.size()));

    // Step 1: canonical frame (first of the sequence), stored fully.
    Flow canon;
    if (!ReadFlo(dir + "/" + seq + "/" + frames[0], &canon)) return false;
    w->U32(canon.w);
    w->U32(canon.h);
    w->Raw(canon.data.data(), canon.data.size() * 4);

    // Step 2: fixed randomized subsample of every frame.
    for (const auto& fr : frames) {
      Flow flow;
      if (!ReadFlo(dir + "/" + seq + "/" + fr, &flow)) {
        fprintf(stderr, "bad flo: %s/%s/%s\n", dir.c_str(), seq.c_str(),
                fr.c_str());
        return false;
      }
      uint32_t npix = flow.w * flow.h;
      uint32_t nsamples = (npix + stride - 1) / stride;
      w->Str(fr);
      w->U32(flow.w);
      w->U32(flow.h);
      w->U32(nsamples);
      Lcg rng(seed ^ std::hash<std::string>{}(seq + "/" + fr));
      for (uint32_t i = 0; i < nsamples; ++i) {
        uint32_t idx = rng.Next() % npix;
        w->U32(idx);
        w->F32(flow.data[size_t(idx) * 2]);
        w->F32(flow.data[size_t(idx) * 2 + 1]);
      }
    }
  }
  return true;
}

bool XzCompressToFile(const std::vector<uint8_t>& in, const char* path) {
  size_t bound = lzma_stream_buffer_bound(in.size());
  std::vector<uint8_t> out(bound);
  size_t out_pos = 0;
  lzma_ret r = lzma_easy_buffer_encode(6, LZMA_CHECK_CRC64, nullptr,
                                       in.data(), in.size(), out.data(),
                                       &out_pos, out.size());
  if (r != LZMA_OK) {
    fprintf(stderr, "lzma error %d\n", int(r));
    return false;
  }
  FILE* f = fopen(path, "wb");
  if (!f) return false;
  size_t n = fwrite(out.data(), 1, out_pos, f);
  fclose(f);
  printf("wrote %s: %zu -> %zu bytes\n", path, in.size(), out_pos);
  return n == out_pos;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4) {
    fprintf(stderr,
            "usage: bundler DIR_CLEAN DIR_FINAL OUTFILE "
            "[subsample_stride=16] [seed=1234]\n");
    return 2;
  }
  uint32_t stride = argc > 4 ? uint32_t(atoi(argv[4])) : 16;
  uint64_t seed = argc > 5 ? uint64_t(atoll(argv[5])) : 1234;

  Writer w;
  w.Raw("CTB1", 4);
  w.U32(1);  // version
  w.U32(2);  // passes: clean, final
  if (!PackPass(argv[1], stride, seed, &w)) return 1;
  if (!PackPass(argv[2], stride, seed, &w)) return 1;
  return XzCompressToFile(w.buf(), argv[3]) ? 0 : 1;
}
