// mmqg_host — native host-side media ingest for mmqg_tpu.
//
// The reference's host pipeline was per-sample Python: np.load of frame
// arrays (reference utils/dataset.py:38) and wav decode inside the torch.hub
// VGGish model (reference model/encoder.py:17). This library supplies the
// production ingest path: batched example packing (frames .npy + salient
// .wav -> preallocated padded batch buffers) on a worker-thread pool with an
// async submit/wait API so the host packs batch i+1 while the TPU consumes
// batch i (double buffering).
//
// Exposed via a C ABI consumed with ctypes (no pybind11 in this image —
// see mmqg_tpu/data/native.py).
//
// Components:
//   wav decode   RIFF/WAVE PCM16 / PCM32 / float32, arbitrary rate/channels
//   resample     linear interpolation to mono target-rate int16
//   npy load     minimal parser for uint8 C-order arrays (the salient-frame
//                artifact format, reference dataset/get_salient_frames.py:47)
//   pack pool    N worker threads filling a batch; async handle per batch

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// ----------------------------------------------------------------- file io

static bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n < 0) { std::fclose(f); return false; }
  out.resize(static_cast<size_t>(n));
  size_t got = n ? std::fread(out.data(), 1, static_cast<size_t>(n), f) : 0;
  std::fclose(f);
  return got == static_cast<size_t>(n);
}

// ----------------------------------------------------------------- wav

struct WavData {
  std::vector<float> mono;  // [-1, 1]
  int rate = 0;
};

static uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}
static uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

static bool parse_wav(const std::vector<uint8_t>& buf, WavData& out) {
  if (buf.size() < 12 || std::memcmp(buf.data(), "RIFF", 4) != 0 ||
      std::memcmp(buf.data() + 8, "WAVE", 4) != 0)
    return false;
  size_t pos = 12;
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* data = nullptr;
  size_t data_size = 0;
  while (pos + 8 <= buf.size()) {
    const uint8_t* chunk = buf.data() + pos;
    uint32_t size = rd_u32(chunk + 4);
    const uint8_t* body = chunk + 8;
    if (pos + 8 + size > buf.size()) size = static_cast<uint32_t>(buf.size() - pos - 8);
    if (std::memcmp(chunk, "fmt ", 4) == 0 && size >= 16) {
      fmt = rd_u16(body);
      channels = rd_u16(body + 2);
      rate = rd_u32(body + 4);
      bits = rd_u16(body + 14);
    } else if (std::memcmp(chunk, "data", 4) == 0) {
      data = body;
      data_size = size;
    }
    pos += 8 + size + (size & 1);
  }
  if (!data || channels == 0 || rate == 0) return false;

  size_t frame_bytes = channels * (bits / 8);
  if (frame_bytes == 0) return false;
  size_t n = data_size / frame_bytes;
  out.mono.resize(n);
  out.rate = static_cast<int>(rate);
  const float inv_ch = 1.0f / channels;
  if (fmt == 1 && bits == 16) {
    for (size_t i = 0; i < n; ++i) {
      float acc = 0.0f;
      for (int c = 0; c < channels; ++c) {
        int16_t v;
        std::memcpy(&v, data + (i * channels + c) * 2, 2);
        acc += v * (1.0f / 32768.0f);
      }
      out.mono[i] = acc * inv_ch;
    }
  } else if (fmt == 1 && bits == 32) {
    for (size_t i = 0; i < n; ++i) {
      float acc = 0.0f;
      for (int c = 0; c < channels; ++c) {
        int32_t v;
        std::memcpy(&v, data + (i * channels + c) * 4, 4);
        acc += static_cast<float>(v) * (1.0f / 2147483648.0f);
      }
      out.mono[i] = acc * inv_ch;
    }
  } else if (fmt == 3 && bits == 32) {
    for (size_t i = 0; i < n; ++i) {
      float acc = 0.0f;
      for (int c = 0; c < channels; ++c) {
        float v;
        std::memcpy(&v, data + (i * channels + c) * 4, 4);
        acc += v;
      }
      out.mono[i] = acc * inv_ch;
    }
  } else {
    return false;
  }
  return true;
}

// linear resample to target rate, emit int16
static long resample_to_i16(const WavData& wav, int target_rate, int16_t* out,
                            long max_samples) {
  if (wav.mono.empty()) return 0;
  long n_out;
  if (wav.rate == target_rate) {
    n_out = static_cast<long>(wav.mono.size());
  } else {
    n_out = static_cast<long>(
        static_cast<double>(wav.mono.size()) * target_rate / wav.rate + 0.5);
  }
  if (n_out > max_samples) n_out = max_samples;
  const double step = static_cast<double>(wav.rate) / target_rate;
  const long n_in = static_cast<long>(wav.mono.size());
  for (long i = 0; i < n_out; ++i) {
    double t = i * step;
    long i0 = static_cast<long>(t);
    if (i0 >= n_in - 1) {
      out[i] = static_cast<int16_t>(wav.mono[n_in - 1] * 32767.0f);
      continue;
    }
    double frac = t - i0;
    float v = static_cast<float>(wav.mono[i0] * (1.0 - frac) +
                                 wav.mono[i0 + 1] * frac);
    if (v > 1.0f) v = 1.0f;
    if (v < -1.0f) v = -1.0f;
    out[i] = static_cast<int16_t>(v * 32767.0f);
  }
  return n_out;
}

// ----------------------------------------------------------------- npy

// Minimal .npy parser for C-order arrays. Returns data pointer inside buf
// and fills shape (up to 8 dims). Only validates what the packer needs.
static const uint8_t* parse_npy(const std::vector<uint8_t>& buf,
                                long shape[8], int* ndim,
                                std::string* dtype, size_t* payload_bytes) {
  if (buf.size() < 10 || std::memcmp(buf.data(), "\x93NUMPY", 6) != 0)
    return nullptr;
  int major = buf[6];
  size_t header_len, header_off;
  if (major == 1) {
    header_len = rd_u16(buf.data() + 8);
    header_off = 10;
  } else if (major == 2 || major == 3) {
    if (buf.size() < 12) return nullptr;  // v2/v3 length field is 4 bytes
    header_len = rd_u32(buf.data() + 8);
    header_off = 12;
  } else {
    return nullptr;  // unknown/corrupt version byte
  }
  if (header_off + header_len > buf.size()) return nullptr;
  *payload_bytes = buf.size() - header_off - header_len;
  std::string hdr(reinterpret_cast<const char*>(buf.data() + header_off),
                  header_len);
  // descr
  size_t dp = hdr.find("'descr'");
  if (dp == std::string::npos) return nullptr;
  size_t q1 = hdr.find('\'', dp + 7);
  size_t q2 = hdr.find('\'', q1 + 1);
  *dtype = hdr.substr(q1 + 1, q2 - q1 - 1);
  if (hdr.find("'fortran_order': True") != std::string::npos) return nullptr;
  // shape tuple
  size_t sp = hdr.find("'shape'");
  size_t p1 = hdr.find('(', sp);
  size_t p2 = hdr.find(')', p1);
  std::string tup = hdr.substr(p1 + 1, p2 - p1 - 1);
  *ndim = 0;
  const char* s = tup.c_str();
  while (*s && *ndim < 8) {
    while (*s == ' ' || *s == ',') ++s;
    if (!*s) break;
    shape[(*ndim)++] = std::strtol(s, const_cast<char**>(&s), 10);
  }
  return buf.data() + header_off + header_len;
}

// ----------------------------------------------------------------- packer

struct PackItem {
  std::string frame_path;  // may be empty
  std::string wav_path;    // may be empty
  uint8_t* frames_out;     // (t_max, h, w, 3) slot
  int16_t* audio_out;      // (s_max,) slot
  int32_t* frames_len;
  int32_t* audio_len;
};

struct PackJob {
  std::vector<PackItem> items;
  int t_max, h, w;
  long s_max;
  int target_rate;
  std::atomic<size_t> next{0};
  std::atomic<int> errors{0};
  std::vector<std::thread> workers;
};

static void pack_worker(PackJob* job) {
  std::vector<uint8_t> buf;
  WavData wav;
  for (;;) {
    size_t i = job->next.fetch_add(1);
    if (i >= job->items.size()) break;
    PackItem& it = job->items[i];
    // frames
    if (!it.frame_path.empty()) {
      if (read_file(it.frame_path.c_str(), buf)) {
        long shape[8];
        int ndim = 0;
        std::string dtype;
        size_t payload = 0;
        const uint8_t* data = parse_npy(buf, shape, &ndim, &dtype, &payload);
        size_t frame_bytes = static_cast<size_t>(job->h) * job->w * 3;
        // never memcpy past the file: a truncated .npy (partial prep write)
        // must not become a heap overread of shape-implied bytes
        if (data && ndim == 4 && dtype == "|u1" && shape[1] == job->h &&
            shape[2] == job->w && shape[3] == 3 &&
            payload >= static_cast<size_t>(shape[0]) * frame_bytes) {
          long t = shape[0] < job->t_max ? shape[0] : job->t_max;
          std::memcpy(it.frames_out, data, t * frame_bytes);
          *it.frames_len = static_cast<int32_t>(t);
        } else {
          job->errors.fetch_add(1);
          *it.frames_len = 0;
        }
      } else {
        job->errors.fetch_add(1);
        *it.frames_len = 0;
      }
    }
    // audio
    if (!it.wav_path.empty()) {
      wav.mono.clear();
      if (read_file(it.wav_path.c_str(), buf) && parse_wav(buf, wav)) {
        *it.audio_len = static_cast<int32_t>(
            resample_to_i16(wav, job->target_rate, it.audio_out, job->s_max));
      } else {
        job->errors.fetch_add(1);
        *it.audio_len = 0;
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode one wav to mono int16 at target_rate. Returns samples written, -1 on
// parse failure.
long mmqg_load_wav_mono(const char* path, int target_rate, int16_t* out,
                        long max_samples) {
  std::vector<uint8_t> buf;
  WavData wav;
  if (!read_file(path, buf) || !parse_wav(buf, wav)) return -1;
  return resample_to_i16(wav, target_rate, out, max_samples);
}

// Load a uint8 (T,H,W,3) .npy into out (t_max slots). Returns T clamped to
// t_max, -1 on failure.
long mmqg_load_frames(const char* path, uint8_t* out, int t_max, int h, int w) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf)) return -1;
  long shape[8];
  int ndim = 0;
  std::string dtype;
  size_t payload = 0;
  const uint8_t* data = parse_npy(buf, shape, &ndim, &dtype, &payload);
  size_t frame_bytes = static_cast<size_t>(h) * w * 3;
  if (!data || ndim != 4 || dtype != "|u1" || shape[1] != h || shape[2] != w ||
      shape[3] != 3 ||
      payload < static_cast<size_t>(shape[0]) * frame_bytes)
    return -1;  // incl. truncated payload: no shape-implied overread
  long t = shape[0] < t_max ? shape[0] : t_max;
  std::memcpy(out, data, static_cast<size_t>(t) * frame_bytes);
  return t;
}

// Async batch pack: fills frames (n, t_max, h, w, 3) u8, audio (n, s_max)
// i16, frames_len (n), audio_len (n) from per-example artifact paths.
// NULL path entries skip that modality. Returns an opaque handle; join with
// mmqg_pack_wait (returns #errors).
void* mmqg_pack_submit(const char** frame_paths, const char** wav_paths, int n,
                       uint8_t* frames, int t_max, int h, int w,
                       int16_t* audio, long s_max, int target_rate,
                       int32_t* frames_len, int32_t* audio_len,
                       int n_threads) {
  auto* job = new PackJob();
  job->t_max = t_max;
  job->h = h;
  job->w = w;
  job->s_max = s_max;
  job->target_rate = target_rate;
  job->items.resize(n);
  size_t frame_stride = static_cast<size_t>(t_max) * h * w * 3;
  for (int i = 0; i < n; ++i) {
    PackItem& it = job->items[i];
    if (frame_paths && frame_paths[i]) it.frame_path = frame_paths[i];
    if (wav_paths && wav_paths[i]) it.wav_path = wav_paths[i];
    it.frames_out = frames + static_cast<size_t>(i) * frame_stride;
    it.audio_out = audio + static_cast<size_t>(i) * s_max;
    it.frames_len = frames_len + i;
    it.audio_len = audio_len + i;
  }
  if (n_threads < 1) n_threads = 1;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw > 0 && n_threads > hw) n_threads = hw;
  for (int t = 0; t < n_threads; ++t)
    job->workers.emplace_back(pack_worker, job);
  return job;
}

int mmqg_pack_wait(void* handle) {
  auto* job = static_cast<PackJob*>(handle);
  for (auto& w : job->workers) w.join();
  int errors = job->errors.load();
  delete job;
  return errors;
}

}  // extern "C"
