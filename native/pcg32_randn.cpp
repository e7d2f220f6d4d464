// Native PCG32 (XSH-RR) + Box-Muller Gaussian sampler.
//
// C++ counterpart of the reference's Rust deterministic RNG
// (src/utils/deterministic_rng.rs:6-82) and of the NumPy implementation in
// candle_video_tpu/utils/rng.py — bit-exact with both.  Used to build
// initial latents host-side fast before upload.
//
// Build: make -C native   (part of libgguf_dequant.so build? no — its own .so)

#include <cmath>
#include <cstdint>

namespace {

struct Pcg32 {
  uint64_t state;
  uint64_t inc;

  explicit Pcg32(uint64_t seed, uint64_t inc_in) {
    inc = (inc_in << 1u) | 1u;
    state = 0;
    next_u32();
    state += seed;
    next_u32();
  }

  uint32_t next_u32() {
    const uint64_t old = state;
    state = old * 6364136223846793005ULL + inc;
    const uint32_t xorshifted = (uint32_t)(((old >> 18u) ^ old) >> 27u);
    const uint32_t rot = (uint32_t)(old >> 59u);
    return (xorshifted >> rot) | (xorshifted << ((-rot) & 31u));
  }

  float next_f32() {
    return (float)(next_u32() >> 8) * 5.9604645e-8f;
  }
};

}  // namespace

extern "C" {

// Fill out[0..n) with standard-normal floats, PCG32(seed, inc) Box-Muller.
void pcg32_randn(uint64_t seed, uint64_t inc, int64_t n, float* out) {
  Pcg32 rng(seed, inc);
  int64_t i = 0;
  while (i < n) {
    float u1;
    do {
      u1 = rng.next_f32();
    } while (u1 <= 1e-7f);
    const float u2 = rng.next_f32();
    const float mag = std::sqrt(-2.0f * std::log(u1));
    const float ang = 2.0f * 3.14159265358979323846f * u2;
    out[i] = mag * std::cos(ang);
    if (i + 1 < n) out[i + 1] = mag * std::sin(ang);
    i += 2;
  }
}

// Raw u32 stream (testing / other consumers).
void pcg32_u32(uint64_t seed, uint64_t inc, int64_t n, uint32_t* out) {
  Pcg32 rng(seed, inc);
  for (int64_t i = 0; i < n; ++i) out[i] = rng.next_u32();
}

}  // extern "C"
