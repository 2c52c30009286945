// Native audio decode + resample.
//
// Replaces the libsndfile/soundfile/librosa/ffmpeg stack the reference
// reaches through `datasets.features.Audio` decoding
// (run_pseudo_labelling.py:261-263, SURVEY.md §2.2): a from-scratch FLAC
// decoder (ReazonSpeech v2 shards are FLAC), a RIFF/WAV parser
// (PCM16/24/32/float), and a Kaiser-windowed-sinc polyphase resampler to
// 16 kHz. All outputs are mono float32 in [-1, 1]; multi-channel input is
// averaged.
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Bit reader (MSB-first, as FLAC requires)
// ---------------------------------------------------------------------------
struct BitReader {
  const uint8_t* data;
  int64_t size;
  int64_t byte_pos = 0;
  int bit_pos = 0;  // 0..7, MSB first
  bool error = false;

  uint64_t bits(int n) {
    uint64_t v = 0;
    while (n > 0) {
      if (byte_pos >= size) {
        error = true;
        return 0;
      }
      int avail = 8 - bit_pos;
      int take = n < avail ? n : avail;
      int shift = avail - take;
      uint32_t mask = (1u << take) - 1;
      v = (v << take) | ((data[byte_pos] >> shift) & mask);
      bit_pos += take;
      n -= take;
      if (bit_pos == 8) {
        bit_pos = 0;
        ++byte_pos;
      }
    }
    return v;
  }

  int64_t signed_bits(int n) {
    uint64_t v = bits(n);
    if (n == 0) return 0;
    if (v & (1ull << (n - 1))) return static_cast<int64_t>(v) - (1ll << n);
    return static_cast<int64_t>(v);
  }

  int64_t unary() {
    int64_t q = 0;
    while (!error && bits(1) == 0) {
      ++q;
      if (q > 1 << 24) {  // corrupt stream guard
        error = true;
        return 0;
      }
    }
    return q;
  }

  void align() {
    if (bit_pos != 0) {
      bit_pos = 0;
      ++byte_pos;
    }
  }
};

int64_t rice_read(BitReader& br, int param) {
  int64_t q = br.unary();
  uint64_t r = param > 0 ? br.bits(param) : 0;
  uint64_t u = (static_cast<uint64_t>(q) << param) | r;
  // zigzag
  return (u >> 1) ^ -static_cast<int64_t>(u & 1);
}

bool read_residual(BitReader& br, int order, int blocksize,
                   std::vector<int64_t>& out) {
  int method = static_cast<int>(br.bits(2));
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  int escape = method == 0 ? 0xF : 0x1F;
  int po = static_cast<int>(br.bits(4));
  int parts = 1 << po;
  if (blocksize % parts != 0) return false;
  int psize = blocksize >> po;
  int idx = order;
  for (int p = 0; p < parts; ++p) {
    int count = psize - (p == 0 ? order : 0);
    if (count < 0) return false;
    int param = static_cast<int>(br.bits(plen));
    if (param == escape) {
      int rawbits = static_cast<int>(br.bits(5));
      for (int i = 0; i < count; ++i) out[idx++] = br.signed_bits(rawbits);
    } else {
      for (int i = 0; i < count; ++i) out[idx++] = rice_read(br, param);
    }
    if (br.error) return false;
  }
  return true;
}

bool read_subframe(BitReader& br, int blocksize, int bps,
                   std::vector<int64_t>& out) {
  if (br.bits(1) != 0) return false;  // padding bit
  int type = static_cast<int>(br.bits(6));
  int wasted = 0;
  if (br.bits(1) == 1) {
    wasted = 1 + static_cast<int>(br.unary());
    bps -= wasted;
  }
  out.assign(blocksize, 0);

  if (type == 0) {  // constant
    int64_t v = br.signed_bits(bps);
    for (int i = 0; i < blocksize; ++i) out[i] = v;
  } else if (type == 1) {  // verbatim
    for (int i = 0; i < blocksize; ++i) out[i] = br.signed_bits(bps);
  } else if (type >= 8 && type <= 12) {  // fixed, order 0-4
    int order = type - 8;
    for (int i = 0; i < order; ++i) out[i] = br.signed_bits(bps);
    if (!read_residual(br, order, blocksize, out)) return false;
    for (int i = order; i < blocksize; ++i) {
      switch (order) {
        case 0:
          break;
        case 1:
          out[i] += out[i - 1];
          break;
        case 2:
          out[i] += 2 * out[i - 1] - out[i - 2];
          break;
        case 3:
          out[i] += 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3];
          break;
        case 4:
          out[i] +=
              4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3] - out[i - 4];
          break;
      }
    }
  } else if (type >= 32) {  // LPC, order 1-32
    int order = (type & 31) + 1;
    for (int i = 0; i < order; ++i) out[i] = br.signed_bits(bps);
    int precision = static_cast<int>(br.bits(4)) + 1;
    if (precision == 16) return false;  // 1111 invalid
    int shift = static_cast<int>(br.signed_bits(5));
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br.signed_bits(precision);
    if (!read_residual(br, order, blocksize, out)) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += coef[j] * out[i - 1 - j];
      out[i] += acc >> shift;
    }
  } else {
    return false;
  }
  if (wasted > 0)
    for (auto& v : out) v <<= wasted;
  return !br.error;
}

uint64_t read_utf8_number(BitReader& br) {
  uint64_t b0 = br.bits(8);
  int extra = 0;
  uint64_t v = 0;
  if ((b0 & 0x80) == 0) return b0;
  // count leading ones
  int ones = 0;
  for (int i = 7; i >= 0 && (b0 & (1 << i)); --i) ++ones;
  extra = ones - 1;
  v = b0 & (0x7F >> ones);
  for (int i = 0; i < extra; ++i) v = (v << 6) | (br.bits(8) & 0x3F);
  return v;
}

const int kBlockSizes[16] = {0,   192,  576,  1152, 2304, 4608, -1,  -2,
                             256, 512,  1024, 2048, 4096, 8192, 16384, 32768};
const int kSampleRates[16] = {0,     88200, 176400, 192000, 8000,  16000,
                              22050, 24000, 32000,  44100,  48000, 96000,
                              -1,    -2,    -3,     0};
const int kSampleSizes[8] = {0, 8, 12, 0, 16, 20, 24, 32};

struct Decoded {
  std::vector<float> mono;
  int sample_rate = 0;
};

bool decode_flac(const uint8_t* data, int64_t size, Decoded& out) {
  if (size < 8 || std::memcmp(data, "fLaC", 4) != 0) return false;
  int64_t pos = 4;
  int sample_rate = 0, channels = 0, bps = 0;
  uint64_t total_samples = 0;
  bool last = false;
  while (!last && pos + 4 <= size) {
    uint8_t hdr = data[pos];
    last = hdr & 0x80;
    int type = hdr & 0x7F;
    uint32_t len = (data[pos + 1] << 16) | (data[pos + 2] << 8) | data[pos + 3];
    pos += 4;
    if (type == 0 && len >= 34) {  // STREAMINFO
      const uint8_t* s = data + pos;
      sample_rate = (s[10] << 12) | (s[11] << 4) | (s[12] >> 4);
      channels = ((s[12] >> 1) & 0x7) + 1;
      bps = (((s[12] & 1) << 4) | (s[13] >> 4)) + 1;
      total_samples = (static_cast<uint64_t>(s[13] & 0xF) << 32) |
                      (static_cast<uint64_t>(s[14]) << 24) | (s[15] << 16) |
                      (s[16] << 8) | s[17];
    }
    pos += len;
  }
  if (sample_rate == 0 || channels == 0 || channels > 8 || bps == 0)
    return false;
  out.sample_rate = sample_rate;
  if (total_samples) out.mono.reserve(total_samples);

  BitReader br{data, size};
  br.byte_pos = pos;

  std::vector<std::vector<int64_t>> ch(channels);
  const double scale = 1.0 / (1ll << (bps - 1));

  while (br.byte_pos < size) {
    // frame sync
    uint64_t sync = br.bits(14);
    if (br.error) break;
    if (sync != 0x3FFE) return out.mono.size() > 0;  // trailing garbage/ID3
    br.bits(1);                                      // reserved
    br.bits(1);                                      // blocking strategy
    int bs_code = static_cast<int>(br.bits(4));
    int sr_code = static_cast<int>(br.bits(4));
    int ch_code = static_cast<int>(br.bits(4));
    int ss_code = static_cast<int>(br.bits(3));
    br.bits(1);  // reserved
    read_utf8_number(br);
    int blocksize = kBlockSizes[bs_code];
    if (blocksize == -1)
      blocksize = static_cast<int>(br.bits(8)) + 1;
    else if (blocksize == -2)
      blocksize = static_cast<int>(br.bits(16)) + 1;
    else if (blocksize == 0)
      return false;
    int sr = kSampleRates[sr_code];
    if (sr == -1)
      br.bits(8);
    else if (sr == -2 || sr == -3)
      br.bits(16);
    int frame_bps = ss_code == 0 ? bps : kSampleSizes[ss_code];
    if (frame_bps == 0) frame_bps = bps;
    br.bits(8);  // CRC-8

    int nch = channels;
    int assign = ch_code;
    if (assign >= 8 && assign <= 10) nch = 2;

    for (int c = 0; c < nch; ++c) {
      int sub_bps = frame_bps;
      // side channel carries one extra bit
      if ((assign == 8 && c == 1) || (assign == 9 && c == 0) ||
          (assign == 10 && c == 1))
        ++sub_bps;
      if (static_cast<int>(ch.size()) <= c) ch.resize(c + 1);
      if (!read_subframe(br, blocksize, sub_bps, ch[c])) return false;
    }
    br.align();
    br.bits(16);  // CRC-16

    // stereo decorrelation
    if (assign == 8) {  // left/side
      for (int i = 0; i < blocksize; ++i) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (assign == 9) {  // right/side: ch0=side, ch1=right
      for (int i = 0; i < blocksize; ++i) ch[0][i] = ch[0][i] + ch[1][i];
    } else if (assign == 10) {  // mid/side
      for (int i = 0; i < blocksize; ++i) {
        int64_t side = ch[1][i];
        int64_t mid = (ch[0][i] << 1) | (side & 1);
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }

    int out_ch = (assign >= 8) ? 2 : channels;
    for (int i = 0; i < blocksize; ++i) {
      double acc = 0;
      for (int c = 0; c < out_ch; ++c) acc += static_cast<double>(ch[c][i]);
      out.mono.push_back(static_cast<float>(acc * scale / out_ch));
    }
    if (br.error) break;
  }
  return true;
}

// ---------------------------------------------------------------------------
// WAV
// ---------------------------------------------------------------------------
uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }

bool decode_wav(const uint8_t* data, int64_t size, Decoded& out) {
  if (size < 44 || std::memcmp(data, "RIFF", 4) != 0 ||
      std::memcmp(data + 8, "WAVE", 4) != 0)
    return false;
  int64_t pos = 12;
  int fmt = 0, channels = 0, bps = 0;
  int sample_rate = 0;
  const uint8_t* pcm = nullptr;
  int64_t pcm_len = 0;
  while (pos + 8 <= size) {
    uint32_t chunk_len = rd32(data + pos + 4);
    if (std::memcmp(data + pos, "fmt ", 4) == 0 && chunk_len >= 16) {
      const uint8_t* f = data + pos + 8;
      fmt = rd16(f);
      channels = rd16(f + 2);
      sample_rate = static_cast<int>(rd32(f + 4));
      bps = rd16(f + 14);
      if (fmt == 0xFFFE && chunk_len >= 40) fmt = rd16(f + 24);  // extensible
    } else if (std::memcmp(data + pos, "data", 4) == 0) {
      pcm = data + pos + 8;
      pcm_len = chunk_len;
      if (pcm + pcm_len > data + size) pcm_len = data + size - pcm;
    }
    pos += 8 + chunk_len + (chunk_len & 1);
  }
  if (!pcm || channels == 0 || sample_rate == 0) return false;
  out.sample_rate = sample_rate;
  int bytes = bps / 8;
  int64_t frames = pcm_len / (bytes * channels);
  out.mono.resize(frames);
  for (int64_t i = 0; i < frames; ++i) {
    double acc = 0;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* p = pcm + (i * channels + c) * bytes;
      double v = 0;
      if (fmt == 3 && bps == 32) {  // float32
        float fv;
        std::memcpy(&fv, p, 4);
        v = fv;
      } else if (bps == 16) {
        v = static_cast<int16_t>(rd16(p)) / 32768.0;
      } else if (bps == 24) {
        int32_t s = (p[0] << 8) | (p[1] << 16) |
                    (static_cast<int32_t>(static_cast<int8_t>(p[2])) << 24);
        v = (s >> 8) / 8388608.0;
      } else if (bps == 32) {
        v = static_cast<int32_t>(rd32(p)) / 2147483648.0;
      } else if (bps == 8) {
        v = (p[0] - 128) / 128.0;
      }
      acc += v;
    }
    out.mono[i] = static_cast<float>(acc / channels);
  }
  return true;
}

// ---------------------------------------------------------------------------
// Polyphase resampler: Kaiser-windowed sinc, 32 taps, 128 phases with
// linear phase interpolation.
// ---------------------------------------------------------------------------
double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 32; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-12 * sum) break;
  }
  return sum;
}

void resample(const std::vector<float>& in, int sr_in, int sr_out,
              std::vector<float>& out) {
  if (sr_in == sr_out) {
    out = in;
    return;
  }
  const int TAPS = 32;
  const int PHASES = 128;
  double ratio = static_cast<double>(sr_out) / sr_in;
  double cutoff = (ratio < 1.0 ? ratio : 1.0) * 0.945;
  const double beta = 8.6;
  const double i0b = bessel_i0(beta);
  // filter table: PHASES+1 x TAPS
  static thread_local std::vector<float> table;
  static thread_local double cached_cutoff = -1;
  if (cached_cutoff != cutoff) {
    table.assign((PHASES + 1) * TAPS, 0.f);
    for (int p = 0; p <= PHASES; ++p) {
      double frac = static_cast<double>(p) / PHASES;
      for (int t = 0; t < TAPS; ++t) {
        double x = t - TAPS / 2 + 1 - frac;
        double sinc = x == 0 ? cutoff
                             : std::sin(M_PI * cutoff * x) / (M_PI * x);
        double w = x / (TAPS / 2);
        double win = std::abs(w) >= 1.0
                         ? 0.0
                         : bessel_i0(beta * std::sqrt(1 - w * w)) / i0b;
        table[p * TAPS + t] = static_cast<float>(sinc * win);
      }
    }
    cached_cutoff = cutoff;
  }
  int64_t n_out = static_cast<int64_t>(in.size() * ratio);
  out.resize(n_out);
  int64_t n_in = static_cast<int64_t>(in.size());
  for (int64_t i = 0; i < n_out; ++i) {
    double t_in = i / ratio;
    int64_t i0 = static_cast<int64_t>(t_in);
    double frac = t_in - i0;
    double pf = frac * PHASES;
    int p = static_cast<int>(pf);
    float pfrac = static_cast<float>(pf - p);
    const float* f0 = &table[p * TAPS];
    const float* f1 = &table[(p + 1) * TAPS];
    double acc = 0;
    for (int t = 0; t < TAPS; ++t) {
      int64_t idx = i0 + t - TAPS / 2 + 1;
      if (idx < 0 || idx >= n_in) continue;
      float c = f0[t] + pfrac * (f1[t] - f0[t]);
      acc += c * in[idx];
    }
    out[i] = static_cast<float>(acc);
  }
}

}  // namespace

// ---------------------------------------------------------------------------
// MP3 (MPEG-1/2 Layer III) via the system codec library (libmpg123),
// loaded lazily with dlopen. The reference decodes common_voice/ESB MP3
// through datasets' ffmpeg path (run_pseudo_labelling.py:261-263,
// requirements.txt:12-15); binding the system codec from the native audio
// module is the same engineering choice — a spec-compliant Layer III
// decoder is not something to hand-roll for a production pipeline. When
// the library is absent the decode fails cleanly (-1) and callers skip
// the utterance, as with any undecodable payload.
// ---------------------------------------------------------------------------

#include <dlfcn.h>

namespace {

struct Mpg123 {
  // minimal ABI surface (mpg123.h); off_t is 64-bit on this platform
  void* (*newh)(const char*, int*) = nullptr;
  void (*del)(void*) = nullptr;
  int (*format_none)(void*) = nullptr;
  int (*format)(void*, long, int, int) = nullptr;
  int (*open_feed)(void*) = nullptr;
  int (*feed)(void*, const unsigned char*, size_t) = nullptr;
  int (*decode_frame)(void*, int64_t*, unsigned char**, size_t*) = nullptr;
  int (*getformat)(void*, long*, int*, int*) = nullptr;
  int (*close)(void*) = nullptr;
  bool ok = false;
};

// mpg123 API constants (mpg123.h)
constexpr int MPG123_OK_ = 0;
constexpr int MPG123_NEED_MORE_ = -10;
constexpr int MPG123_NEW_FORMAT_ = -11;
constexpr int MPG123_DONE_ = -12;
constexpr int MPG123_ENC_FLOAT_32_ = 0x200;
constexpr int MPG123_MONO_STEREO_ = 0x3;

const Mpg123& mpg123() {
  static Mpg123 m = [] {
    Mpg123 r;
    void* lib = dlopen("libmpg123.so.0", RTLD_NOW | RTLD_LOCAL);
    if (!lib) lib = dlopen("libmpg123.so", RTLD_NOW | RTLD_LOCAL);
    if (!lib) return r;
    auto sym = [&](const char* name) { return dlsym(lib, name); };
    // modern libmpg123 no longer requires mpg123_init(); call if present
    if (auto init = reinterpret_cast<int (*)()>(sym("mpg123_init"))) init();
    r.newh = reinterpret_cast<void* (*)(const char*, int*)>(sym("mpg123_new"));
    r.del = reinterpret_cast<void (*)(void*)>(sym("mpg123_delete"));
    r.format_none = reinterpret_cast<int (*)(void*)>(sym("mpg123_format_none"));
    r.format =
        reinterpret_cast<int (*)(void*, long, int, int)>(sym("mpg123_format"));
    r.open_feed = reinterpret_cast<int (*)(void*)>(sym("mpg123_open_feed"));
    r.feed = reinterpret_cast<int (*)(void*, const unsigned char*, size_t)>(
        sym("mpg123_feed"));
    r.decode_frame =
        reinterpret_cast<int (*)(void*, int64_t*, unsigned char**, size_t*)>(
            sym("mpg123_decode_frame_64") ? sym("mpg123_decode_frame_64")
                                          : sym("mpg123_decode_frame"));
    r.getformat = reinterpret_cast<int (*)(void*, long*, int*, int*)>(
        sym("mpg123_getformat"));
    r.close = reinterpret_cast<int (*)(void*)>(sym("mpg123_close"));
    r.ok = r.newh && r.del && r.format_none && r.format && r.open_feed &&
           r.feed && r.decode_frame && r.getformat && r.close;
    return r;
  }();
  return m;
}

bool looks_like_mp3(const uint8_t* data, int64_t size) {
  if (size < 4) return false;
  if (std::memcmp(data, "ID3", 3) == 0) return true;  // ID3v2 tag
  // frame sync: 11 set bits, MPEG audio version != reserved, layer III
  return data[0] == 0xFF && (data[1] & 0xE0) == 0xE0 &&
         ((data[1] >> 3) & 0x3) != 1 /* version */ &&
         ((data[1] >> 1) & 0x3) == 1 /* layer III */;
}

bool decode_mp3(const uint8_t* data, int64_t size, Decoded& d) {
  const Mpg123& m = mpg123();
  if (!m.ok) return false;
  void* h = m.newh(nullptr, nullptr);
  if (!h) return false;
  // pin the output to fp32 at any rate/channels
  m.format_none(h);
  for (long rate : {8000L, 11025L, 12000L, 16000L, 22050L, 24000L, 32000L,
                    44100L, 48000L})
    m.format(h, rate, MPG123_MONO_STEREO_, MPG123_ENC_FLOAT_32_);
  if (m.open_feed(h) != MPG123_OK_ ||
      m.feed(h, data, static_cast<size_t>(size)) != MPG123_OK_) {
    m.del(h);
    return false;
  }
  long rate = 0;
  int channels = 0, enc = 0;
  for (;;) {
    int64_t num = 0;
    unsigned char* audio = nullptr;
    size_t bytes = 0;
    int rc = m.decode_frame(h, &num, &audio, &bytes);
    if (rc == MPG123_NEW_FORMAT_) {
      m.getformat(h, &rate, &channels, &enc);
      continue;
    }
    if (rc == MPG123_OK_ || rc == MPG123_DONE_) {
      if (audio && bytes && channels > 0) {
        const float* f = reinterpret_cast<const float*>(audio);
        size_t n = bytes / sizeof(float) / channels;
        for (size_t i = 0; i < n; i++) {
          float acc = 0.0f;
          for (int c = 0; c < channels; c++) acc += f[i * channels + c];
          d.mono.push_back(acc / channels);
        }
      }
      if (rc == MPG123_DONE_) break;
      continue;
    }
    break;  // NEED_MORE (stream fully fed -> end) or error
  }
  m.close(h);
  m.del(h);
  d.sample_rate = static_cast<int32_t>(rate);
  return rate > 0 && !d.mono.empty();
}

}  // namespace

extern "C" {

// Decode FLAC, WAV, or MP3 bytes to mono fp32 at `target_rate` (0 = keep
// native).
// Returns number of samples, or -1 on parse failure, -2 if out buffer too
// small (call again with the returned size negated... simpler: caller
// provides generous buffer: duration bound known from container).
// out_rate receives the native sample rate.
int64_t kwt_audio_decode(const uint8_t* data, int64_t size, int32_t target_rate,
                         float* out, int64_t max_out, int32_t* out_rate) {
  Decoded d;
  bool ok = false;
  if (size >= 4 && std::memcmp(data, "fLaC", 4) == 0)
    ok = decode_flac(data, size, d);
  else if (size >= 4 && std::memcmp(data, "RIFF", 4) == 0)
    ok = decode_wav(data, size, d);
  else if (looks_like_mp3(data, size))
    ok = decode_mp3(data, size, d);
  if (!ok) return -1;
  *out_rate = d.sample_rate;
  std::vector<float> res;
  std::vector<float>* src = &d.mono;
  if (target_rate > 0 && target_rate != d.sample_rate) {
    resample(d.mono, d.sample_rate, target_rate, res);
    src = &res;
  }
  if (static_cast<int64_t>(src->size()) > max_out) return -2;
  std::memcpy(out, src->data(), src->size() * sizeof(float));
  return static_cast<int64_t>(src->size());
}

// Standalone resample helper (fp32 mono).
int64_t kwt_resample(const float* in, int64_t n, int32_t sr_in, int32_t sr_out,
                     float* out, int64_t max_out) {
  std::vector<float> inv(in, in + n), res;
  resample(inv, sr_in, sr_out, res);
  if (static_cast<int64_t>(res.size()) > max_out) return -2;
  std::memcpy(out, res.data(), res.size() * sizeof(float));
  return static_cast<int64_t>(res.size());
}

}  // extern "C"
