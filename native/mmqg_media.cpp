// TPU-host media runtime: in-process container demux + audio decode via the
// system libav* libraries (libavformat/libavcodec/libswresample). Replaces
// the reference's ffmpeg *subprocess* contract (reference dataset/
// get_audio.py:6-13 mp4->wav, get_salient_audioclips.py:6-17 span clips)
// with a direct library call — no binary dependency, no process spawn per
// video, and span decode seeks instead of transcoding the whole file.
//
// Built as a SEPARATE shared object from libmmqg_host.so so the core host
// runtime never depends on libav being installed; mmqg_tpu/data/native.py
// degrades to the ffmpeg binary (and then to a clear error) when this
// library cannot build or load.
//
// C ABI (ctypes-friendly), like mmqg_host.cpp.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <memory>
#include <ctime>
#include <vector>

namespace {

inline double now_s() {
  timespec ts;
  clock_gettime(CLOCK_MONOTONIC, &ts);
  return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

__attribute__((constructor)) void mmqg_media_quiet_logs() {
  av_log_set_level(AV_LOG_ERROR);  // encoders chat on stderr otherwise
}

struct Demux {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  int stream = -1;

  ~Demux() {
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
  }

  // 0 ok, -1 io/parse error, -2 no stream of `type`
  int open(const char* path, AVMediaType type = AVMEDIA_TYPE_AUDIO) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -1;
    const AVCodec* codec = nullptr;
    stream = av_find_best_stream(fmt, type, -1, -1, &codec, 0);
    if (stream == AVERROR_STREAM_NOT_FOUND) return -2;
    // a stream EXISTS but this libavcodec build lacks its decoder (or some
    // other failure): that is a capability error (-1, caller falls back to
    // the ffmpeg binary), NOT "no stream"
    if (stream < 0 || !codec) return -1;
    return open_decoder();
  }

  // (Re)create the codec context from the stream's parameters. Reused
  // between spans of one file: avcodec_flush_buffers does NOT reset every
  // decoder's signal state (the AAC overlap-add window survives it —
  // measured as a ~2900-LSB burst at a reused span's head vs a fresh
  // open), so bit-identical multi-span decode needs a FRESH decoder per
  // span while the demux open (file probe + find_stream_info, the
  // expensive part) is paid once.
  int open_decoder() {
    if (dec) avcodec_free_context(&dec);
    const AVCodec* codec =
        avcodec_find_decoder(fmt->streams[stream]->codecpar->codec_id);
    if (!codec) return -1;
    dec = avcodec_alloc_context3(codec);
    if (!dec) return -1;
    if (avcodec_parameters_to_context(dec, fmt->streams[stream]->codecpar) < 0)
      return -1;
    if (avcodec_open2(dec, codec, nullptr) < 0) return -1;
    return 0;
  }
};

// Incremental resampler to interleaved S16 at (rate, channels); initialised
// lazily from the first decoded frame (some codecs only report layout then).
struct Resampler {
  SwrContext* swr = nullptr;
  int rate, channels;
  AVChannelLayout out_layout{};

  Resampler(int r, int ch) : rate(r), channels(ch) {
    av_channel_layout_default(&out_layout, ch);
  }
  ~Resampler() {
    if (swr) swr_free(&swr);
    av_channel_layout_uninit(&out_layout);
  }

  bool init_from(const AVFrame* f) {
    AVChannelLayout in = f->ch_layout;
    if (in.nb_channels == 0) av_channel_layout_default(&in, 1);
    if (swr_alloc_set_opts2(&swr, &out_layout, AV_SAMPLE_FMT_S16, rate, &in,
                            (AVSampleFormat)f->format, f->sample_rate, 0,
                            nullptr) < 0)
      return false;
    return swr_init(swr) >= 0;
  }

  // Convert one frame (or flush with null) into `sink`.
  bool convert(const AVFrame* f, std::vector<int16_t>& sink) {
    int in_n = f ? f->nb_samples : 0;
    int cap = swr_get_out_samples(swr, in_n);
    if (cap <= 0) return true;
    size_t old = sink.size();
    sink.resize(old + (size_t)cap * channels);
    uint8_t* outp = reinterpret_cast<uint8_t*>(sink.data() + old);
    int got = swr_convert(swr, &outp, cap,
                          f ? const_cast<const uint8_t**>(f->extended_data)
                            : nullptr,
                          in_n);
    if (got < 0) return false;
    sink.resize(old + (size_t)got * channels);
    return true;
  }
};

// One span's decode against an ALREADY-OPEN audio demux: seek (keyframe
// at/before start), flush, decode, resample, trim to [start_s, end_s).
// `fresh` marks a just-opened demux — there the seek is skipped for
// start_s <= 0 (the stream is already at the head), matching the original
// single-span entry point byte for byte. Reused demuxes (fresh=false)
// ALWAYS seek+flush: the previous span left the decoder mid-stream or in
// drain mode, and the flush is what resets it. Returns frames written
// (partial output counts), -1 on decode error.
long decode_audio_span(Demux& d, int target_rate, int channels,
                       double start_s, double end_s, int16_t* out,
                       long max_frames, bool fresh) {
  if (max_frames < 0) return -1;
  AVStream* st = d.fmt->streams[d.stream];
  const double tb = av_q2d(st->time_base);

  if (!fresh && d.open_decoder() != 0)
    return -1;  // fresh decoder per span: see Demux::open_decoder
  if (start_s > 0 || !fresh) {
    int64_t ts = (int64_t)llround(std::max(start_s, 0.0) / tb);
    // backward seek lands on/before the target; we trim by sample below
    if (av_seek_frame(d.fmt, d.stream, ts, AVSEEK_FLAG_BACKWARD) >= 0)
      avcodec_flush_buffers(d.dec);
    else if (!fresh)
      return -1;  // reused demux we cannot reposition: would read garbage
  }

  Resampler rs(target_rate, channels);
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  if (!pkt || !frame) {
    if (pkt) av_packet_free(&pkt);
    if (frame) av_frame_free(&frame);
    return -1;
  }

  std::vector<int16_t> pending;  // converted samples not yet emitted
  double base_s = NAN;           // media time of pending[0]
  long written = 0;
  bool failed = false, done = false;

  auto emit = [&]() {
    // pending holds frames starting at media time base_s; drop before
    // start_s, stop at end_s / max_frames
    long nframes = (long)(pending.size() / channels);
    long skip = 0;
    if (base_s < start_s)
      skip = std::min<long>(
          nframes, llround((start_s - base_s) * target_rate));
    long avail = nframes - skip;
    if (end_s > 0) {
      double t0 = base_s + (double)skip / target_rate;
      long until_end = (long)llround((end_s - t0) * target_rate);
      avail = std::min(avail, std::max<long>(until_end, 0));
    }
    long take = std::min(avail, max_frames - written);
    if (take > 0) {
      std::memcpy(out + (size_t)written * channels,
                  pending.data() + (size_t)skip * channels,
                  (size_t)take * channels * sizeof(int16_t));
      written += take;
    }
    base_s += (double)nframes / target_rate;
    pending.clear();
    if (written >= max_frames) done = true;
    if (end_s > 0 && base_s >= end_s) done = true;
  };

  int read_rc = 0;
  bool draining = false, dec_eof = false;
  while (!done && !failed) {
    if (!draining) {
      read_rc = av_read_frame(d.fmt, pkt);
      if (read_rc < 0) {
        draining = true;
        avcodec_send_packet(d.dec, nullptr);  // enter drain mode
      } else if (pkt->stream_index != d.stream) {
        av_packet_unref(pkt);
        continue;
      } else {
        if (avcodec_send_packet(d.dec, pkt) < 0) failed = true;
        av_packet_unref(pkt);
      }
    }
    while (!failed) {
      int r = avcodec_receive_frame(d.dec, frame);
      if (r == AVERROR(EAGAIN)) break;
      if (r == AVERROR_EOF) {
        dec_eof = true;  // tail flush below decides `done`
        break;
      }
      if (r < 0) {
        failed = true;
        break;
      }
      if (!rs.swr && !rs.init_from(frame)) {
        failed = true;
        av_frame_unref(frame);
        break;
      }
      if (std::isnan(base_s)) {
        int64_t pts = frame->best_effort_timestamp;
        base_s = (pts == AV_NOPTS_VALUE) ? 0.0 : pts * tb;
      }
      if (!rs.convert(frame, pending)) failed = true;
      av_frame_unref(frame);
      if (!failed) emit();
      if (done) break;
    }
    if (dec_eof && !done && !failed) {
      // decoder fully drained: flush the resampler's buffered tail (the
      // swr delay) before finishing, so to-EOF decodes aren't truncated
      if (rs.swr) {
        if (!rs.convert(nullptr, pending)) failed = true;
        if (!failed && !pending.empty()) emit();
      }
      done = true;
    }
  }

  av_packet_free(&pkt);
  av_frame_free(&frame);
  if (failed && written == 0) return -1;
  return written;
}

}  // namespace

extern "C" {

// Container duration in seconds; <0 on error.
double mmqg_media_duration(const char* path) {
  Demux d;
  int rc = d.open(path);
  if (rc == -1) return -1.0;
  if (d.fmt->duration == AV_NOPTS_VALUE) return -1.0;
  return (double)d.fmt->duration / AV_TIME_BASE;
}

// Decode the first audio stream of ANY container (mp4/mkv/wav/...) to
// interleaved S16 at target_rate x channels. [start_s, end_s) seconds;
// end_s <= 0 means to EOF. Writes at most max_frames frames (one frame =
// `channels` samples) into out. Returns frames written; -1 on error; -2 if
// the file has no audio stream.
long mmqg_decode_audio(const char* path, int target_rate, int channels,
                       double start_s, double end_s, int16_t* out,
                       long max_frames) {
  if (!path || !out || target_rate <= 0 || channels <= 0 || max_frames < 0)
    return -1;
  Demux d;
  int rc = d.open(path);
  if (rc != 0) return rc;
  return decode_audio_span(d, target_rate, channels, start_s, end_s, out,
                           max_frames, /*fresh=*/true);
}

// Decode N spans of the first audio stream with ONE demux open (plus a
// cheap per-span decoder reopen — Demux::open_decoder). The per-span file
// open (~1.3 ms each: avformat_open_input + find_stream_info) was the top
// host-prep cost at corpus span density once the frame path got its
// index-aware seek (PERF.md "Host-prep leg profile"); serving salient
// spans of one video (reference dataset/get_salient_audioclips.py:6-17
// semantics) pays it once here. Span i writes at out + offsets[i]*channels,
// at most max_frames[i] frames; written[i] receives that span's frame
// count (-1 if that span failed; other spans stay valid). Every span's
// bytes are identical to a fresh-open mmqg_decode_audio call (tested:
// tests/test_media_native.py) — reused spans get a fresh decoder, and a
// reused span starting at 0 reopens the FILE: the demuxer's head state
// (AAC priming/edit-list side data) is not reproducible by an explicit
// seek to ts 0 (measured ~250 differing samples otherwise). Returns 0 all
// spans ok, -1 io/parse error, -2 no audio stream, -3 some span failed.
long mmqg_decode_audio_spans(const char* path, int target_rate, int channels,
                             const double* starts, const double* ends,
                             long n_spans, int16_t* out, const long* offsets,
                             const long* max_frames, long* written) {
  if (!path || !out || !starts || !ends || !offsets || !max_frames ||
      !written || target_rate <= 0 || channels <= 0 || n_spans < 0)
    return -1;
  std::unique_ptr<Demux> d(new Demux);
  int rc = d->open(path);
  if (rc != 0) return rc;
  bool any_failed = false;
  for (long i = 0; i < n_spans; ++i) {
    bool fresh = i == 0;
    if (!fresh && starts[i] <= 0) {
      d.reset(new Demux);
      if (d->open(path) != 0) {
        written[i] = -1;
        any_failed = true;
        continue;
      }
      fresh = true;
    }
    long n = decode_audio_span(*d, target_rate, channels, starts[i], ends[i],
                               out + (size_t)offsets[i] * channels,
                               max_frames[i], fresh);
    written[i] = n;
    if (n < 0) any_failed = true;
  }
  return any_failed ? -3 : 0;
}

// Video stream info. Returns 0 ok, -1 io/parse error, -2 no video stream.
// fps is the container's average frame rate; n_frames is the stream's
// RECORDED frame count — 0 when the container does not record one (callers
// that need a bound must estimate from duration*fps and treat it as
// inexact).
long mmqg_media_video_info(const char* path, double* fps, double* duration_s,
                           long* n_frames, long* width, long* height) {
  Demux d;
  int rc = d.open(path, AVMEDIA_TYPE_VIDEO);
  if (rc != 0) return rc;
  AVStream* st = d.fmt->streams[d.stream];
  double r = av_q2d(st->avg_frame_rate);
  if (!(r > 0)) r = av_q2d(st->r_frame_rate);
  double dur = (d.fmt->duration == AV_NOPTS_VALUE)
                   ? 0.0
                   : (double)d.fmt->duration / AV_TIME_BASE;
  if (fps) *fps = r;
  if (duration_s) *duration_s = dur;
  if (n_frames) *n_frames = (st->nb_frames > 0) ? (long)st->nb_frames : 0;
  if (width) *width = d.dec->width;
  if (height) *height = d.dec->height;
  return 0;
}

// Decode video frames BY DISPLAY INDEX (sorted ascending), resized to
// out_w x out_h BGR24 (SWS_AREA — the counterpart of cv2's INTER_AREA; BGR
// matches the cv2 artifact byte layout the salient-frame .npy files use).
//
// Index addressing is exact for constant-frame-rate streams: the first two
// frames give (pts0, dt) and frame k lives at pts0 + k*dt ticks. Containers
// often report a skewed avg_frame_rate (nb_frames/duration counts one less
// interval than frames), so TIME-based targeting drifts by a frame per
// ~hundreds of frames; tick arithmetic is integer-exact. A frame whose pts
// does not equal its predicted tick (VFR, dropped frames) is reported as
// missing so the caller can fall back to a linear decode.
//
// The point vs a linear full decode: each target seeks to the nearest
// KEYFRAME at/before its pts and decodes forward only from there — for
// sparse question spans in a long lecture this skips most of the file.
// Targets close ahead (< seek_ahead_s, default 2 s) roll forward without a
// redundant seek, so dense ~1 fps sampling inside a span costs one seek per
// span, not per frame.
//
// skip_mode != 0 enables ADAPTIVE decoder-level frame skipping for the
// frames between targets (the ~1 fps sampling only keeps every
// ceil(fps)-th frame; the rest decode purely to carry reference state):
// start at AVDISCARD_NONKEY (only keyframes reconstruct — a huge win when
// the sampling grid lands on keyframes, e.g. GOP == fps); when a target
// frame was itself skipped, seek back and retry at the next weaker level
// (NONREF: only non-reference B-frames skipped — their reconstruction
// feeds nothing, so emitted frames stay BIT-IDENTICAL; then no skipping).
// The downgrade is sticky for the rest of the file (GOP structure is
// uniform), so misalignment costs at most two partial-GOP retries per
// file. Emitted bytes are identical in every mode — skipping only elides
// frames that are never emitted and never referenced by emitted ones.
//
// legs (optional, double[4]): accumulated wall-clock seconds per stage —
// {open (demux probe + codec open), seek (+flush), decode (read/send/
// receive), swscale} — the host-prep profile's data source.
//
// out: n * out_h * out_w * 3 bytes. found[i]: 1 where frame indices[i] was
// decoded (past-EOF / pts-mismatch slots stay 0, out slot untouched).
// pts_out[i] (optional): the frame's pts in seconds RELATIVE to the first
// frame. tick_s (optional): the learned frame interval in seconds — callers
// reconstruct neighbour timestamps (e.g. cv2's CAP_PROP_POS_MSEC reads
// lagged by one frame) without another decode.
// Returns count found; -1 io/parse/decode error; -2 no video stream.
long mmqg_decode_frames_idx2(const char* path, const long* indices, long n,
                             int out_w, int out_h, double seek_ahead_s,
                             int skip_mode, uint8_t* out, uint8_t* found,
                             double* pts_out, double* tick_s, double* legs) {
  if (!path || !indices || !out || !found || n < 0 || out_w <= 0 ||
      out_h <= 0)
    return -1;
  if (n == 0) return 0;
  if (seek_ahead_s <= 0) seek_ahead_s = 2.0;
  double t_open = 0, t_seek = 0, t_dec = 0, t_sws = 0;
  double t0 = now_s();
  Demux d;
  int rc = d.open(path, AVMEDIA_TYPE_VIDEO);
  t_open = now_s() - t0;
  if (rc != 0) return rc;
  AVStream* st = d.fmt->streams[d.stream];
  const double tb = av_q2d(st->time_base);
  std::memset(found, 0, (size_t)n);

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  if (!pkt || !frame) {
    if (pkt) av_packet_free(&pkt);
    if (frame) av_frame_free(&frame);
    return -1;
  }

  SwsContext* sws = nullptr;
  int sws_w = -1, sws_h = -1;
  AVPixelFormat sws_fmt = AV_PIX_FMT_NONE;
  const size_t frame_bytes = (size_t)out_w * out_h * 3;

  auto emit = [&](const AVFrame* src, long i) -> bool {
    double te = now_s();
    if (!sws || src->width != sws_w || src->height != sws_h ||
        (AVPixelFormat)src->format != sws_fmt) {
      if (sws) sws_freeContext(sws);
      sws = sws_getContext(src->width, src->height,
                           (AVPixelFormat)src->format, out_w, out_h,
                           AV_PIX_FMT_BGR24,
                           SWS_AREA | SWS_ACCURATE_RND | SWS_FULL_CHR_H_INT,
                           nullptr, nullptr,
                           nullptr);
      if (!sws) return false;
      sws_w = src->width;
      sws_h = src->height;
      sws_fmt = (AVPixelFormat)src->format;
    }
    uint8_t* dst[4] = {out + (size_t)i * frame_bytes, nullptr, nullptr,
                       nullptr};
    int strides[4] = {out_w * 3, 0, 0, 0};
    sws_scale(sws, src->data, src->linesize, 0, src->height, dst, strides);
    found[i] = 1;
    t_sws += now_s() - te;
    return true;
  };

  // Demux/decode pump: next video frame into `f`. 0 ok, 1 EOF, -1 error.
  bool draining = false;
  auto next_frame = [&](AVFrame* f) -> int {
    double td = now_s();
    int out_rc;
    while (true) {
      int r = avcodec_receive_frame(d.dec, f);
      if (r == 0) { out_rc = 0; break; }
      if (r == AVERROR_EOF) { out_rc = 1; break; }
      if (r != AVERROR(EAGAIN)) { out_rc = -1; break; }
      if (draining) { out_rc = 1; break; }  // defensive; EAGAIN after drain
      int rr = av_read_frame(d.fmt, pkt);
      if (rr < 0) {
        draining = true;
        avcodec_send_packet(d.dec, nullptr);
        continue;
      }
      if (pkt->stream_index != d.stream) {
        av_packet_unref(pkt);
        continue;
      }
      rr = avcodec_send_packet(d.dec, pkt);
      av_packet_unref(pkt);
      if (rr < 0 && rr != AVERROR(EAGAIN)) { out_rc = -1; break; }
    }
    t_dec += now_s() - td;
    return out_rc;
  };

  auto pts_of = [&](const AVFrame* f) -> int64_t {
    int64_t pts = f->best_effort_timestamp;
    return (pts == AV_NOPTS_VALUE) ? INT64_MIN : pts;
  };

  // skip levels: 2 = NONKEY, 1 = NONREF, 0 = decode everything
  auto set_skip = [&](int level) {
    d.dec->skip_frame = level >= 2   ? AVDISCARD_NONKEY
                        : level == 1 ? AVDISCARD_NONREF
                                     : AVDISCARD_DEFAULT;
  };
  int skip_level = skip_mode ? 2 : 0;

  // Learn the CFR grid from the first two frames (skip disabled: frame 1
  // may be a non-key frame the skip modes would elide).
  int64_t pts0 = 0, dt = 0;
  {
    if (next_frame(frame) != 0) {
      rc = -1;
      goto cleanup;
    }
    pts0 = pts_of(frame);
    av_frame_unref(frame);
    if (next_frame(frame) != 0 || pts0 == INT64_MIN) {
      rc = -1;
      goto cleanup;
    }
    dt = pts_of(frame) - pts0;
    av_frame_unref(frame);
    if (dt <= 0) {
      rc = -1;
      goto cleanup;
    }
    if (tick_s) *tick_s = dt * tb;
  }

  {
    const int64_t ahead_ticks = (int64_t)llround(seek_ahead_s / tb);
    int64_t cur_pts = INT64_MIN;  // pts of the last decoded frame
    bool at_eof = false, failed = false;
    long written = 0;

    // Keyframe at/before `ts` straight from the DEMUX INDEX (mp4 sample
    // table / mkv cues) — no seek, no decode. Lets the per-target decision
    // below be exact: rolling forward from cur_pts decodes (target -
    // cur_pts) frames; seeking decodes only (target - keyframe). When the
    // keyframe is AHEAD of the current position, every frame in between is
    // dead work the index proves we can skip. Index timestamps can be DTS
    // for B-frame streams — a frame or two of slack that can only cost a
    // marginal seek decision, never correctness (pts targeting below is
    // unchanged). INT64_MIN when the container has no usable index.
    auto key_before = [&](int64_t ts) -> int64_t {
      int idx = av_index_search_timestamp(st, ts, AVSEEK_FLAG_BACKWARD);
      if (idx < 0) return INT64_MIN;
      const AVIndexEntry* e = avformat_index_get_entry(st, idx);
      return e ? e->timestamp : INT64_MIN;
    };

    auto seek_to = [&](int64_t ts) -> bool {
      double tsk = now_s();
      bool ok = av_seek_frame(d.fmt, d.stream, ts, AVSEEK_FLAG_BACKWARD) >= 0;
      if (ok) {
        avcodec_flush_buffers(d.dec);
        cur_pts = INT64_MIN;
        at_eof = draining = false;
      }
      t_seek += now_s() - tsk;
      return ok;
    };

    // restart clean so index 0 is reachable
    if (!seek_to(pts0)) {
      rc = -1;
      goto cleanup;
    }
    if (skip_level >= 2) {
      // NONKEY only pays when the sampling grid lands on keyframes; the
      // demux index answers that up front, skipping the wasted first-target
      // retry. DTS-indexed B-frame streams can fail the equality spuriously
      // — that only downgrades to NONREF (still exact, still skips B's).
      for (long i = 0; i < n && skip_level >= 2; ++i) {
        if (indices[i] < 0) continue;
        const int64_t kt = key_before(pts0 + indices[i] * dt);
        if (kt == INT64_MIN || kt != pts0 + indices[i] * dt) skip_level = 1;
      }
    }
    set_skip(skip_level);

    for (long i = 0; i < n && !failed; ++i) {
      if (indices[i] < 0) continue;
      const int64_t target = pts0 + indices[i] * dt;
      while (true) {
        bool want_seek;
        if (target < cur_pts || cur_pts == INT64_MIN) {
          want_seek = true;
        } else {
          const int64_t kt = key_before(target);
          // index available: seek exactly when the target's keyframe is
          // ahead of the current position (the frames in between decode
          // for nothing); no index: the fixed look-ahead heuristic
          want_seek = (kt != INT64_MIN)
                          ? (kt > cur_pts && !at_eof)
                          : (target > cur_pts + ahead_ticks && !at_eof);
        }
        if (want_seek) {
          // seek failure (unseekable input): continue linearly from here
          seek_to(target);
        }
        // Decode forward to the exact target pts.
        bool emitted = false;
        while (!at_eof && !failed && cur_pts < target) {
          int r = next_frame(frame);
          if (r < 0) {
            failed = true;
            break;
          }
          if (r == 1) {
            at_eof = true;
            break;
          }
          int64_t p = pts_of(frame);
          if (p == INT64_MIN) p = cur_pts == INT64_MIN ? target - 1 : cur_pts;
          cur_pts = p;
          if (p == target) {
            if (!emit(frame, i)) failed = true;
            if (pts_out) pts_out[i] = (double)(p - pts0) * tb;
            ++written;
            emitted = true;
          }
          // p > target: skipped by the decoder, VFR, or a dropped frame —
          // the adaptive retry below decides which
          av_frame_unref(frame);
        }
        if (emitted || failed) break;
        if (skip_level > 0) {
          // The target itself may have been elided by the skip level (a
          // non-key target under NONKEY, a non-ref B target under NONREF):
          // downgrade STICKILY (GOP structure is uniform within a file) and
          // retry this target from its keyframe. A genuine miss (VFR /
          // past-EOF) exhausts the levels and lands in the no-skip branch,
          // preserving the exact pre-skip semantics.
          --skip_level;
          set_skip(skip_level);
          if (!seek_to(target)) break;  // unseekable: cannot retry
          continue;
        }
        break;  // no skip active: genuine miss — slot stays missing
      }
      // cur_pts == target but frame already consumed for an earlier equal
      // index (duplicate targets): equal indices share target == cur_pts,
      // the decode loop is skipped and the slot stays missing. Callers
      // pass unique indices.
    }

    rc = (failed && written == 0) ? -1 : (int)written;
  }

cleanup:
  if (sws) sws_freeContext(sws);
  av_packet_free(&pkt);
  av_frame_free(&frame);
  if (legs) {
    legs[0] = t_open;
    legs[1] = t_seek;
    legs[2] = t_dec;
    legs[3] = t_sws;
  }
  return rc;
}

// Back-compat entry: no decoder-level frame skipping, no leg timings —
// byte-identical behaviour to the pre-skip implementation.
long mmqg_decode_frames_idx(const char* path, const long* indices, long n,
                            int out_w, int out_h, double seek_ahead_s,
                            uint8_t* out, uint8_t* found, double* pts_out,
                            double* tick_s) {
  return mmqg_decode_frames_idx2(path, indices, n, out_w, out_h,
                                 seek_ahead_s, 0, out, found, pts_out,
                                 tick_s, nullptr);
}

// Self-test fixture writer: an mp4 with an AAC sine tone (freq Hz, 44.1 kHz
// mono) and — when with_video != 0 — an MPEG-4 video stream (w x h @ fps,
// per-frame brightness ramp (i*3)%255, matching the cv2 fixture in
// tests/test_pipeline.py). Lets the decode paths be exercised against REAL
// mp4 streams without shipping binary fixtures or the ffmpeg binary.
// Returns 0 on success, -1 on error (e.g. encoder not built in).
long mmqg_write_test_av_mp4(const char* path, double seconds, int freq,
                            int with_video, int w, int h, int fps) {
  const int sr = 44100;
  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, nullptr, path) < 0 || !fmt)
    return -1;
  const AVCodec* acodec = avcodec_find_encoder(AV_CODEC_ID_AAC);
  const AVCodec* vcodec =
      with_video ? avcodec_find_encoder(AV_CODEC_ID_MPEG4) : nullptr;
  long rc = -1;
  AVCodecContext* aenc = nullptr;
  AVCodecContext* venc = nullptr;
  AVStream* ast = nullptr;
  AVStream* vst = nullptr;
  AVFrame* aframe = nullptr;
  AVFrame* vframe = nullptr;
  AVPacket* pkt = nullptr;
  do {
    if (!acodec || (with_video && !vcodec)) break;
    ast = avformat_new_stream(fmt, nullptr);
    if (!ast) break;
    aenc = avcodec_alloc_context3(acodec);
    if (!aenc) break;
    aenc->sample_rate = sr;
    av_channel_layout_default(&aenc->ch_layout, 1);
    aenc->sample_fmt = acodec->sample_fmts ? acodec->sample_fmts[0]
                                           : AV_SAMPLE_FMT_FLTP;
    aenc->bit_rate = 96000;
    aenc->time_base = {1, sr};
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
      aenc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(aenc, acodec, nullptr) < 0) break;
    if (avcodec_parameters_from_context(ast->codecpar, aenc) < 0) break;
    ast->time_base = aenc->time_base;

    if (with_video) {
      vst = avformat_new_stream(fmt, nullptr);
      if (!vst) break;
      venc = avcodec_alloc_context3(vcodec);
      if (!venc) break;
      venc->width = w;
      venc->height = h;
      venc->pix_fmt = AV_PIX_FMT_YUV420P;
      venc->time_base = {1, fps};
      venc->bit_rate = 400000;
      venc->gop_size = fps;
      if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
        venc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
      if (avcodec_open2(venc, vcodec, nullptr) < 0) break;
      if (avcodec_parameters_from_context(vst->codecpar, venc) < 0) break;
      vst->time_base = venc->time_base;
    }

    if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
        avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0)
      break;
    if (avformat_write_header(fmt, nullptr) < 0) break;

    aframe = av_frame_alloc();
    pkt = av_packet_alloc();
    if (!aframe || !pkt) break;
    const int fsz = aenc->frame_size > 0 ? aenc->frame_size : 1024;
    aframe->format = aenc->sample_fmt;
    av_channel_layout_copy(&aframe->ch_layout, &aenc->ch_layout);
    aframe->sample_rate = sr;
    aframe->nb_samples = fsz;
    if (av_frame_get_buffer(aframe, 0) < 0) break;

    bool err = false;
    auto drain = [&](AVCodecContext* c, AVStream* st) {
      while (true) {
        int r = avcodec_receive_packet(c, pkt);
        if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return true;
        if (r < 0) return false;
        av_packet_rescale_ts(pkt, c->time_base, st->time_base);
        pkt->stream_index = st->index;
        if (av_interleaved_write_frame(fmt, pkt) < 0) return false;
      }
    };

    long total = (long)llround(seconds * sr);
    for (long pos = 0; pos < total && !err; pos += fsz) {
      if (av_frame_make_writable(aframe) < 0) { err = true; break; }
      int n = (int)std::min<long>(fsz, total - pos);
      aframe->nb_samples = n;
      float* dst = reinterpret_cast<float*>(aframe->data[0]);
      for (int i = 0; i < n; ++i)
        dst[i] = 0.5f * std::sin(2.0 * M_PI * freq * (pos + i) / sr);
      aframe->pts = pos;
      if (avcodec_send_frame(aenc, aframe) < 0 || !drain(aenc, ast))
        err = true;
    }
    if (!err && (avcodec_send_frame(aenc, nullptr) < 0 || !drain(aenc, ast)))
      err = true;

    if (with_video && !err) {
      vframe = av_frame_alloc();
      if (!vframe) { err = true; }
      if (!err) {
        vframe->format = AV_PIX_FMT_YUV420P;
        vframe->width = w;
        vframe->height = h;
        if (av_frame_get_buffer(vframe, 0) < 0) err = true;
      }
      long nframes = (long)llround(seconds * fps);
      for (long i = 0; i < nframes && !err; ++i) {
        if (av_frame_make_writable(vframe) < 0) { err = true; break; }
        uint8_t y = (uint8_t)((i * 3) % 255);
        for (int r = 0; r < h; ++r)
          std::memset(vframe->data[0] + r * vframe->linesize[0], y, w);
        for (int r = 0; r < h / 2; ++r) {
          std::memset(vframe->data[1] + r * vframe->linesize[1], 128, w / 2);
          std::memset(vframe->data[2] + r * vframe->linesize[2], 128, w / 2);
        }
        vframe->pts = i;
        if (avcodec_send_frame(venc, vframe) < 0 || !drain(venc, vst))
          err = true;
      }
      if (!err &&
          (avcodec_send_frame(venc, nullptr) < 0 || !drain(venc, vst)))
        err = true;
    }

    if (!err && av_write_trailer(fmt) < 0) err = true;
    if (!err) rc = 0;
  } while (false);

  if (aframe) av_frame_free(&aframe);
  if (vframe) av_frame_free(&vframe);
  if (pkt) av_packet_free(&pkt);
  if (aenc) avcodec_free_context(&aenc);
  if (venc) avcodec_free_context(&venc);
  if (fmt) {
    if (!(fmt->oformat->flags & AVFMT_NOFILE) && fmt->pb)
      avio_closep(&fmt->pb);
    avformat_free_context(fmt);
  }
  return rc;
}

// Back-compat audio-only fixture.
long mmqg_write_test_tone_mp4(const char* path, double seconds, int freq) {
  return mmqg_write_test_av_mp4(path, seconds, freq, 0, 0, 0, 0);
}

}  // extern "C"
