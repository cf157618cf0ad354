// vimo_dataplane — native video-decode data plane for vimoclip_tpu.
//
// TPU-native replacement for the decord / PyAV / torchvision C++ decode
// wheels the reference depends on (SURVEY.md §2.2): a thin FFmpeg
// (libavformat/libavcodec/libswscale) decoder with
//   - whole-video batched decode into a caller-owned RGB24 uint8 buffer,
//   - frame-accurate windowed decode (keyframe seek + pts-indexed skip,
//     the access pattern of reference dataset_frame_diff_mn.py:57-80),
// exposed through a minimal C ABI consumed via ctypes
// (vimoclip_tpu/data/native.py). No Python objects cross the boundary; the
// GIL is released for the whole decode (ctypes does this automatically),
// so host decode threads overlap device compute.
//
// Build: `make` in this directory -> libvimo_dataplane.so

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

struct VimoDecoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  int stream_idx = -1;
  int width = 0;
  int height = 0;
  double fps = 0.0;
  AVRational time_base{};
  int64_t start_pts = 0;
  long linear_next = 0;  // next frame index in linear (no-seek) mode
};

void destroy(VimoDecoder* d) {
  if (!d) return;
  if (d->sws) sws_freeContext(d->sws);
  if (d->frame) av_frame_free(&d->frame);
  if (d->pkt) av_packet_free(&d->pkt);
  if (d->codec) avcodec_free_context(&d->codec);
  if (d->fmt) avformat_close_input(&d->fmt);
  delete d;
}

// Frame index from pts (constant-fps assumption; falls back to the running
// linear counter when pts is unavailable).
long frame_index(const VimoDecoder* d, const AVFrame* f, long fallback) {
  int64_t pts = f->pts != AV_NOPTS_VALUE ? f->pts : f->best_effort_timestamp;
  if (pts == AV_NOPTS_VALUE) return fallback;
  double seconds = (pts - d->start_pts) * av_q2d(d->time_base);
  return lround(seconds * d->fps);
}

// Convert one decoded frame into buf at row `slot`.
void emit(VimoDecoder* d, const AVFrame* f, uint8_t* buf, long slot) {
  uint8_t* dst[1] = {buf + slot * (long)d->height * d->width * 3};
  int dst_linesize[1] = {d->width * 3};
  sws_scale(d->sws, f->data, f->linesize, 0, d->height, dst, dst_linesize);
}

}  // namespace

extern "C" {

void* vimo_open(const char* path) {
  auto* d = new VimoDecoder();
  if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
    destroy(d);
    return nullptr;
  }
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
    destroy(d);
    return nullptr;
  }
  const AVCodec* dec = nullptr;
  d->stream_idx =
      av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
  if (d->stream_idx < 0 || !dec) {
    destroy(d);
    return nullptr;
  }
  AVStream* st = d->fmt->streams[d->stream_idx];
  d->codec = avcodec_alloc_context3(dec);
  if (!d->codec ||
      avcodec_parameters_to_context(d->codec, st->codecpar) < 0 ||
      avcodec_open2(d->codec, dec, nullptr) < 0) {
    destroy(d);
    return nullptr;
  }
  d->width = d->codec->width;
  d->height = d->codec->height;
  d->time_base = st->time_base;
  AVRational fr = av_guess_frame_rate(d->fmt, st, nullptr);
  d->fps = fr.num > 0 && fr.den > 0 ? av_q2d(fr) : 30.0;
  d->start_pts = st->start_time != AV_NOPTS_VALUE ? st->start_time : 0;
  d->sws = sws_getContext(d->width, d->height, d->codec->pix_fmt, d->width,
                          d->height, AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr,
                          nullptr, nullptr);
  d->pkt = av_packet_alloc();
  d->frame = av_frame_alloc();
  if (!d->sws || !d->pkt || !d->frame) {
    destroy(d);
    return nullptr;
  }
  return d;
}

void vimo_close(void* h) { destroy(static_cast<VimoDecoder*>(h)); }

long vimo_frame_count(void* h) {
  auto* d = static_cast<VimoDecoder*>(h);
  AVStream* st = d->fmt->streams[d->stream_idx];
  if (st->nb_frames > 0) return st->nb_frames;
  if (st->duration != AV_NOPTS_VALUE)
    return lround(st->duration * av_q2d(d->time_base) * d->fps);
  if (d->fmt->duration != AV_NOPTS_VALUE)
    return lround(d->fmt->duration / (double)AV_TIME_BASE * d->fps);
  return -1;
}

void vimo_dims(void* h, int* w, int* ht) {
  auto* d = static_cast<VimoDecoder*>(h);
  *w = d->width;
  *ht = d->height;
}

// Decode frames [start, start+num) into buf ((num, H, W, 3) uint8 RGB).
// Returns the number of frames written (< num at EOF), or negative on error.
long vimo_read_window(void* h, long start, long num, void* out) {
  auto* d = static_cast<VimoDecoder*>(h);
  uint8_t* buf = static_cast<uint8_t*>(out);

  // Position the demuxer: keyframe-seek for windows that start ahead,
  // byte-zero rewind otherwise (also resets the linear counter).
  bool use_pts = true;
  if (start != d->linear_next) {
    int64_t target_pts =
        d->start_pts +
        llround(start / (d->fps * av_q2d(d->time_base)));
    if (av_seek_frame(d->fmt, d->stream_idx, target_pts,
                      AVSEEK_FLAG_BACKWARD) < 0) {
      if (av_seek_frame(d->fmt, d->stream_idx, 0,
                        AVSEEK_FLAG_BACKWARD | AVSEEK_FLAG_BYTE) < 0)
        return -1;
      use_pts = false;
      d->linear_next = 0;
    }
    avcodec_flush_buffers(d->codec);
  }

  long produced = 0;
  long fallback_idx = use_pts ? -1 : 0;
  bool eof_sent = false;
  while (produced < num) {
    int ret;
    if (!eof_sent) {
      ret = av_read_frame(d->fmt, d->pkt);
      if (ret < 0) {
        avcodec_send_packet(d->codec, nullptr);  // flush
        eof_sent = true;
        continue;
      }
      if (d->pkt->stream_index != d->stream_idx) {
        av_packet_unref(d->pkt);
        continue;
      }
      ret = avcodec_send_packet(d->codec, d->pkt);
      av_packet_unref(d->pkt);
      if (ret < 0 && ret != AVERROR(EAGAIN)) return -2;
    }
    while (true) {
      int r = avcodec_receive_frame(d->codec, d->frame);
      if (r == AVERROR(EAGAIN)) break;
      if (r == AVERROR_EOF) return produced;
      if (r < 0) return -3;
      long idx = frame_index(d, d->frame, fallback_idx < 0 ? start : fallback_idx);
      if (fallback_idx >= 0) fallback_idx++;
      if (idx >= start && produced < num) {
        emit(d, d->frame, buf, produced);
        produced++;
        d->linear_next = idx + 1;
      }
      av_frame_unref(d->frame);
      if (produced == num) break;
    }
    if (eof_sent && produced < num) {
      // flushed and drained
      int r = avcodec_receive_frame(d->codec, d->frame);
      if (r == AVERROR_EOF || r == AVERROR(EAGAIN)) return produced;
    }
  }
  return produced;
}

}  // extern "C"
