// Native GGML block-dequantization kernels (Q8_0 / Q4_K / Q5_K / Q6_K / F16).
//
// TPU-native counterpart of the CUDA quantized kernels the reference inherits
// from candle (prebuilt/candle-kernels, used via QTensor::dequantize at
// src/models/ltx_video/quantized_t5_encoder.rs:59-71).  Exposed as a C ABI for
// ctypes; the Python side falls back to the NumPy implementation when this
// library is not built.
//
// Build: make -C native   (produces libgguf_dequant.so)

#include <cstdint>
#include <cstring>

namespace {

constexpr int QK_K = 256;

inline float f16_to_f32(uint16_t h) {
  uint32_t sign = (uint32_t)(h >> 15) << 31;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t mant = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;
    } else {
      // subnormal: normalize
      int e = -1;
      do {
        mant <<= 1;
        e++;
      } while (!(mant & 0x400));
      mant &= 0x3FF;
      bits = sign | ((uint32_t)(127 - 15 - e) << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000u | (mant << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float out;
  std::memcpy(&out, &bits, 4);
  return out;
}

inline void get_scale_min_k4(int j, const uint8_t* q, uint8_t* d, uint8_t* m) {
  if (j < 4) {
    *d = q[j] & 63;
    *m = q[j + 4] & 63;
  } else {
    *d = (q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4);
    *m = (q[j + 4] >> 4) | ((q[j] >> 6) << 4);
  }
}

}  // namespace

extern "C" {

void dequant_f16(const uint8_t* in, float* out, int64_t n) {
  const uint16_t* src = reinterpret_cast<const uint16_t*>(in);
  for (int64_t i = 0; i < n; ++i) out[i] = f16_to_f32(src[i]);
}

// Q8_0: 34-byte blocks of 32: f16 d, int8 qs[32]
void dequant_q8_0(const uint8_t* in, float* out, int64_t n) {
  const int64_t nb = n / 32;
  for (int64_t b = 0; b < nb; ++b) {
    const uint8_t* blk = in + b * 34;
    uint16_t du;
    std::memcpy(&du, blk, 2);
    const float d = f16_to_f32(du);
    const int8_t* qs = reinterpret_cast<const int8_t*>(blk + 2);
    float* y = out + b * 32;
    for (int i = 0; i < 32; ++i) y[i] = d * qs[i];
  }
}

// Q4_K: 144-byte super-blocks of 256
void dequant_q4_k(const uint8_t* in, float* out, int64_t n) {
  const int64_t nb = n / QK_K;
  for (int64_t b = 0; b < nb; ++b) {
    const uint8_t* blk = in + b * 144;
    uint16_t du, dmu;
    std::memcpy(&du, blk, 2);
    std::memcpy(&dmu, blk + 2, 2);
    const float d = f16_to_f32(du);
    const float dmin = f16_to_f32(dmu);
    const uint8_t* scales = blk + 4;
    const uint8_t* q = blk + 16;
    float* y = out + b * QK_K;
    int is = 0;
    for (int j = 0; j < QK_K; j += 64) {
      uint8_t sc, m;
      get_scale_min_k4(is, scales, &sc, &m);
      const float d1 = d * sc, m1 = dmin * m;
      get_scale_min_k4(is + 1, scales, &sc, &m);
      const float d2 = d * sc, m2 = dmin * m;
      for (int l = 0; l < 32; ++l) *y++ = d1 * (q[l] & 0xF) - m1;
      for (int l = 0; l < 32; ++l) *y++ = d2 * (q[l] >> 4) - m2;
      q += 32;
      is += 2;
    }
  }
}

// Q5_K: 176-byte super-blocks of 256
void dequant_q5_k(const uint8_t* in, float* out, int64_t n) {
  const int64_t nb = n / QK_K;
  for (int64_t b = 0; b < nb; ++b) {
    const uint8_t* blk = in + b * 176;
    uint16_t du, dmu;
    std::memcpy(&du, blk, 2);
    std::memcpy(&dmu, blk + 2, 2);
    const float d = f16_to_f32(du);
    const float dmin = f16_to_f32(dmu);
    const uint8_t* scales = blk + 4;
    const uint8_t* qh = blk + 16;
    const uint8_t* ql = blk + 48;
    float* y = out + b * QK_K;
    int is = 0;
    uint8_t u1 = 1, u2 = 2;
    for (int j = 0; j < QK_K; j += 64) {
      uint8_t sc, m;
      get_scale_min_k4(is, scales, &sc, &m);
      const float d1 = d * sc, m1 = dmin * m;
      get_scale_min_k4(is + 1, scales, &sc, &m);
      const float d2 = d * sc, m2 = dmin * m;
      for (int l = 0; l < 32; ++l)
        *y++ = d1 * ((ql[l] & 0xF) + ((qh[l] & u1) ? 16 : 0)) - m1;
      for (int l = 0; l < 32; ++l)
        *y++ = d2 * ((ql[l] >> 4) + ((qh[l] & u2) ? 16 : 0)) - m2;
      ql += 32;
      is += 2;
      u1 <<= 2;
      u2 <<= 2;
    }
  }
}

// Q6_K: 210-byte super-blocks of 256
void dequant_q6_k(const uint8_t* in, float* out, int64_t n) {
  const int64_t nb = n / QK_K;
  for (int64_t b = 0; b < nb; ++b) {
    const uint8_t* blk = in + b * 210;
    const uint8_t* ql = blk;
    const uint8_t* qh = blk + 128;
    const int8_t* sc = reinterpret_cast<const int8_t*>(blk + 192);
    uint16_t du;
    std::memcpy(&du, blk + 208, 2);
    const float d = f16_to_f32(du);
    float* y = out + b * QK_K;
    for (int half = 0; half < 2; ++half) {
      for (int l = 0; l < 32; ++l) {
        const int is = l / 16;
        const int8_t q1 = (int8_t)((ql[l] & 0xF) | (((qh[l] >> 0) & 3) << 4)) - 32;
        const int8_t q2 = (int8_t)((ql[l + 32] & 0xF) | (((qh[l] >> 2) & 3) << 4)) - 32;
        const int8_t q3 = (int8_t)((ql[l] >> 4) | (((qh[l] >> 4) & 3) << 4)) - 32;
        const int8_t q4 = (int8_t)((ql[l + 32] >> 4) | (((qh[l] >> 6) & 3) << 4)) - 32;
        y[l] = d * sc[is] * q1;
        y[l + 32] = d * sc[is + 2] * q2;
        y[l + 64] = d * sc[is + 4] * q3;
        y[l + 96] = d * sc[is + 6] * q4;
      }
      y += 128;
      ql += 64;
      qh += 32;
      sc += 8;
    }
  }
}

}  // extern "C"
