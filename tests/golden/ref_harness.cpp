// Golden-fixture generator: thin CLI over the ACTUAL reference
// implementation at /root/reference (included verbatim at build time,
// never vendored into this repo). Used only by tests/golden/generate.py
// to produce .ckl fixtures; the fixtures themselves are checked in.
//
// Usage:
//   ref_harness compress <raw> <ckl> dtype sx sy sz allow_pins markov opt_pins
//   ref_harness decompress <ckl> <raw>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "crackle.hpp"

static std::vector<unsigned char> read_file(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) { std::perror(path); std::exit(2); }
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> buf(n);
  if (std::fread(buf.data(), 1, n, f) != (size_t)n) std::exit(2);
  std::fclose(f);
  return buf;
}

static void write_file(const char* path, const unsigned char* data,
                       size_t n) {
  FILE* f = std::fopen(path, "wb");
  if (!f) { std::perror(path); std::exit(2); }
  if (std::fwrite(data, 1, n, f) != n) std::exit(2);
  std::fclose(f);
}

template <typename T>
static std::vector<unsigned char> do_compress(
    const std::vector<unsigned char>& raw, int64_t sx, int64_t sy,
    int64_t sz, bool allow_pins, uint64_t markov, bool opt_pins) {
  return crackle::compress<T>(
      reinterpret_cast<const T*>(raw.data()), sx, sy, sz, allow_pins,
      /*fortran_order=*/true, markov, opt_pins,
      /*auto_bgcolor=*/true, /*manual_bgcolor=*/0, /*parallel=*/1);
}

int main(int argc, char** argv) {
  if (argc < 3) { std::fprintf(stderr, "bad args\n"); return 2; }
  std::string mode = argv[1];

  if (mode == "compress") {
    if (argc != 10) { std::fprintf(stderr, "bad args\n"); return 2; }
    auto raw = read_file(argv[2]);
    int width = std::atoi(argv[4]);
    int64_t sx = std::atoll(argv[5]), sy = std::atoll(argv[6]),
            sz = std::atoll(argv[7]);
    // argv[8] packs optimize_pins*10 + allow_pins.
    int ap = std::atoi(argv[8]);
    bool allow_pins = (ap % 10) != 0;
    bool opt_pins = (ap / 10) != 0;
    uint64_t markov = std::atoll(argv[9]);
    std::vector<unsigned char> out;
    switch (width) {
      case 1: out = do_compress<uint8_t>(raw, sx, sy, sz, allow_pins,
                                         markov, opt_pins); break;
      case 2: out = do_compress<uint16_t>(raw, sx, sy, sz, allow_pins,
                                          markov, opt_pins); break;
      case 4: out = do_compress<uint32_t>(raw, sx, sy, sz, allow_pins,
                                          markov, opt_pins); break;
      case 8: out = do_compress<uint64_t>(raw, sx, sy, sz, allow_pins,
                                          markov, opt_pins); break;
      default: return 2;
    }
    write_file(argv[3], out.data(), out.size());
    return 0;
  }

  if (mode == "decompress") {
    if (argc != 4) { std::fprintf(stderr, "bad args\n"); return 2; }
    auto ckl = read_file(argv[2]);
    auto head = crackle::CrackleHeader(ckl.data());
    size_t voxels = (size_t)head.sx * head.sy * head.sz;
    std::vector<unsigned char> raw(voxels * head.data_width);
    switch (head.data_width) {
      case 1:
        crackle::decompress<uint8_t, uint8_t>(
            ckl.data(), ckl.size(),
            reinterpret_cast<uint8_t*>(raw.data()));
        break;
      case 2:
        crackle::decompress<uint16_t, uint16_t>(
            ckl.data(), ckl.size(),
            reinterpret_cast<uint16_t*>(raw.data()));
        break;
      case 4:
        crackle::decompress<uint32_t, uint32_t>(
            ckl.data(), ckl.size(),
            reinterpret_cast<uint32_t*>(raw.data()));
        break;
      case 8:
        crackle::decompress<uint64_t, uint64_t>(
            ckl.data(), ckl.size(),
            reinterpret_cast<uint64_t*>(raw.data()));
        break;
      default: return 2;
    }
    write_file(argv[3], raw.data(), raw.size());
    return 0;
  }

  std::fprintf(stderr, "unknown mode %s\n", mode.c_str());
  return 2;
}
