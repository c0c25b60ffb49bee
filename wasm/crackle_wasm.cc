// Embeddable / WebAssembly entry points for the crackle codec.
//
// Role parity with the reference's wasm port (wasm/crackle_wasm.cc:
// 22-68 there): a dependency-free C ABI over full .ckl streams —
// compress (flat labels) and decompress — plus small header queries
// so the JS wrapper never parses bytes itself. Build with
// build_wasm.sh (emscripten); the same file compiles natively, which
// is how tests/test_wasm_shim.py round-trips it under g++.
//
// The codec core is crackle_native.cpp (crackle_compress_stream /
// crackle_decompress_stream): single-threaded, exception-free,
// SSE-free when __SSE4_2__ is absent — wasm-safe by construction.
#include <cstdint>
#include <cstdlib>
#include <cstring>

#include "../crackle_tpu/native/crackle_native.cpp"

extern "C" {

// ---- tiny allocator surface for the JS side ----
uint8_t* crackle_malloc(int64_t n) {
  return reinterpret_cast<uint8_t*>(malloc((size_t)n));
}

void crackle_free(void* p) { free(p); }

// ---- header queries (29-byte v1 header) ----
int64_t crackle_header_bytes(void) { return 29; }

// packs sx, sy, sz, data_width, voxels*data_width into out[5];
// returns 0 ok, <0 malformed
int64_t crackle_query(const uint8_t* buf, int64_t n, int64_t* out) {
  if (n < 29 || buf[0] != 'c' || buf[1] != 'r' || buf[2] != 'k'
      || buf[3] != 'l' || buf[4] != 1) {
    return -1;
  }
  uint16_t fmt = (uint16_t)(buf[5] | (buf[6] << 8));
  int64_t dw = 1 << (fmt & 3);
  auto rd32 = [&](int off) {
    int64_t v = 0;
    for (int i = 0; i < 4; i++) v |= (int64_t)buf[off + i] << (8 * i);
    return v;
  };
  out[0] = rd32(7);
  out[1] = rd32(11);
  out[2] = rd32(15);
  out[3] = dw;
  out[4] = out[0] * out[1] * out[2] * dw;
  return 0;
}

// compress an F-order flat label volume into a freshly allocated
// stream; *out_ptr receives the buffer (crackle_free it), returns
// the stream length or <0.
int64_t crackle_compress(
  const void* labels, int32_t data_width,
  int64_t sx, int64_t sy, int64_t sz,
  uint8_t** out_ptr
) {
  int64_t cap = sx * sy * sz * data_width * 2 + 64 * (sz + 1) + 4096;
  uint8_t* buf = crackle_malloc(cap);
  if (!buf) return -1;
  int64_t n = crackle_compress_stream(
    labels, data_width, sx, sy, sz, /*fortran_order=*/1, buf, cap);
  if (n < 0) {
    free(buf);
    return n;
  }
  *out_ptr = buf;
  return n;
}

// decompress a full stream into out (voxels * data_width bytes);
// returns 0 ok, <0 error (see crackle_decompress_stream)
int64_t crackle_decompress(
  const uint8_t* buf, int64_t n, void* out, int64_t out_cap
) {
  return crackle_decompress_stream(buf, n, 0, -1, out, out_cap);
}

}  // extern "C"
