// libosaudio — native host-side audio codec/DSP primitives.
//
// The reference delegates its host-side byte work to native code it doesn't
// own (audioop C module, scipy's compiled resampler, ffmpeg; SURVEY §2.8).
// This library is the first-party replacement for the per-frame hot paths:
// PCM conversion, G.711 companding, linear resampling, RMS normalization and
// silence trimming. Exposed as a plain C ABI consumed via ctypes
// (open_speech_tpu/native/__init__.py); every entry point has a numpy
// fallback so the wheel works without the .so.
//
// Build: make -C native   (produces open_speech_tpu/native/libosaudio.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// ── PCM <-> float ─────────────────────────────────────────────────────

void osa_pcm16_to_f32(const int16_t* in, float* out, int64_t n) {
    constexpr float kInv = 1.0f / 32768.0f;
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * kInv;
}

void osa_f32_to_pcm16(const float* in, int16_t* out, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        float v = in[i];
        v = v > 1.0f ? 1.0f : (v < -1.0f ? -1.0f : v);
        // truncation matches numpy astype(int16) for bit-exact fallback parity
        out[i] = (int16_t)(v * 32767.0f);
    }
}

// ── G.711 companding ──────────────────────────────────────────────────

namespace {

int16_t ulaw_decode_one(uint8_t code) {
    code = ~code;
    int sign = code & 0x80;
    int exponent = (code >> 4) & 0x07;
    int mantissa = code & 0x0F;
    int magnitude = (((mantissa << 3) + 0x84) << exponent) - 0x84;
    return (int16_t)(sign ? -magnitude : magnitude);
}

int16_t alaw_decode_one(uint8_t code) {
    code ^= 0x55;
    int sign = code & 0x80;
    int exponent = (code >> 4) & 0x07;
    int mantissa = code & 0x0F;
    int magnitude = exponent == 0 ? (mantissa << 4) + 8
                                  : ((mantissa << 4) + 0x108) << (exponent - 1);
    // A-law sign convention is inverted vs u-law: sign bit SET -> positive
    // (g711.c st_alaw2linear16; bit-exact vs audioop.alaw2lin)
    return (int16_t)(sign ? magnitude : -magnitude);
}

struct G711Tables {
    int16_t ulaw_dec[256];
    int16_t alaw_dec[256];
    uint8_t ulaw_enc[65536];
    uint8_t alaw_enc[65536];

    G711Tables() {
        for (int c = 0; c < 256; ++c) {
            ulaw_dec[c] = ulaw_decode_one((uint8_t)c);
            alaw_dec[c] = alaw_decode_one((uint8_t)c);
        }
        // ITU-T segment quantizers (g711.c; bit-exact vs audioop lin2ulaw/
        // lin2alaw — a nearest-decode inverse deviates on ~1% of values)
        for (int s = -32768; s <= 32767; ++s) {
            ulaw_enc[(uint16_t)(s + 32768)] = ulaw_encode_one((int16_t)s);
            alaw_enc[(uint16_t)(s + 32768)] = alaw_encode_one((int16_t)s);
        }
    }

    static int seg_search(int val, const int* ends) {
        for (int i = 0; i < 8; ++i)
            if (val <= ends[i]) return i;
        return 8;
    }

    static uint8_t ulaw_encode_one(int16_t sample) {
        static const int ends[8] = {0x3F, 0x7F, 0xFF, 0x1FF,
                                    0x3FF, 0x7FF, 0xFFF, 0x1FFF};
        int pcm = sample >> 2;  // 14-bit domain (st_14linear2ulaw)
        int mask = pcm < 0 ? 0x7F : 0xFF;
        int mag = pcm < 0 ? -pcm : pcm;
        if (mag > 8159) mag = 8159;
        mag += 0x84 >> 2;
        int seg = seg_search(mag, ends);
        if (seg >= 8) return (uint8_t)(0x7F ^ mask);
        return (uint8_t)(((seg << 4) | ((mag >> (seg + 1)) & 0xF)) ^ mask);
    }

    static uint8_t alaw_encode_one(int16_t sample) {
        static const int ends[8] = {0x1F, 0x3F, 0x7F, 0xFF,
                                    0x1FF, 0x3FF, 0x7FF, 0xFFF};
        int pcm = sample >> 3;  // 13-bit domain (st_linear2alaw)
        int mask = pcm >= 0 ? 0xD5 : 0x55;
        int mag = pcm >= 0 ? pcm : -pcm - 1;
        int seg = seg_search(mag, ends);
        if (seg >= 8) return (uint8_t)(0x7F ^ mask);
        int aval = (seg << 4) | (seg < 2 ? (mag >> 1) & 0xF : (mag >> seg) & 0xF);
        return (uint8_t)(aval ^ mask);
    }
};

const G711Tables& tables() {
    static G711Tables t;
    return t;
}

}  // namespace

void osa_ulaw_decode(const uint8_t* in, int16_t* out, int64_t n) {
    const auto& t = tables();
    for (int64_t i = 0; i < n; ++i) out[i] = t.ulaw_dec[in[i]];
}

void osa_ulaw_encode(const int16_t* in, uint8_t* out, int64_t n) {
    const auto& t = tables();
    for (int64_t i = 0; i < n; ++i)
        out[i] = t.ulaw_enc[(uint16_t)((int)in[i] + 32768)];
}

void osa_alaw_decode(const uint8_t* in, int16_t* out, int64_t n) {
    const auto& t = tables();
    for (int64_t i = 0; i < n; ++i) out[i] = t.alaw_dec[in[i]];
}

void osa_alaw_encode(const int16_t* in, uint8_t* out, int64_t n) {
    const auto& t = tables();
    for (int64_t i = 0; i < n; ++i)
        out[i] = t.alaw_enc[(uint16_t)((int)in[i] + 32768)];
}

// ── resampling / DSP ──────────────────────────────────────────────────

// Linear-interpolation resample of int16 PCM (the realtime-format path,
// matching numpy.interp over linspace endpoints).
void osa_linear_resample_i16(const int16_t* in, int64_t n_in, int16_t* out,
                             int64_t n_out) {
    if (n_in <= 0 || n_out <= 0) return;
    if (n_in == 1) {
        for (int64_t i = 0; i < n_out; ++i) out[i] = in[0];
        return;
    }
    const double step = (double)(n_in - 1) / (double)(n_out - 1 > 0 ? n_out - 1 : 1);
    for (int64_t i = 0; i < n_out; ++i) {
        double pos = i * step;
        int64_t i0 = (int64_t)pos;
        if (i0 >= n_in - 1) {
            out[i] = in[n_in - 1];
            continue;
        }
        double frac = pos - i0;
        double v = in[i0] * (1.0 - frac) + in[i0 + 1] * frac;
        v = std::min(32767.0, std::max(-32768.0, std::round(v)));
        out[i] = (int16_t)v;
    }
}

// In-place RMS gain normalization to target dBFS with clipping.
void osa_rms_normalize_f32(float* buf, int64_t n, float target_dbfs) {
    if (n <= 0) return;
    double acc = 0.0;
    for (int64_t i = 0; i < n; ++i) acc += (double)buf[i] * buf[i];
    double rms = std::sqrt(acc / (double)n);
    if (rms <= 1e-8) return;
    double gain = std::pow(10.0, (target_dbfs - 20.0 * std::log10(rms)) / 20.0);
    for (int64_t i = 0; i < n; ++i) {
        float v = (float)(buf[i] * gain);
        buf[i] = v > 1.0f ? 1.0f : (v < -1.0f ? -1.0f : v);
    }
}

// Silence trim bounds: [*start, *end) covers samples above threshold.
void osa_trim_bounds_f32(const float* buf, int64_t n, float threshold,
                         int64_t* start, int64_t* end) {
    int64_t s = 0, e = n;
    while (s < n && std::fabs(buf[s]) <= threshold) ++s;
    if (s == n) {  // all silence: keep everything (python parity)
        *start = 0;
        *end = n;
        return;
    }
    while (e > s && std::fabs(buf[e - 1]) <= threshold) --e;
    *start = s;
    *end = e;
}

int osa_version() { return 1; }

}  // extern "C"
