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
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

namespace {

struct VimoDecoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  AVFrame* rgb = nullptr;  // reusable sws_scale_frame destination
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
  if (d->rgb) av_frame_free(&d->rgb);
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

// YUV->RGB conversion pool. swscale is single-threaded per context (its
// "threads" option only engages through code paths that manage their own
// destination buffers, and the slice API ignores it entirely — measured
// 3.8 ms/frame at 640x360, 4x slower than the decode itself). So frames
// are converted CONCURRENTLY: each worker owns a private SwsContext (bit-
// identical results, same flags) and writes straight into the caller's
// buffer slot.
struct ConvPool {
  VimoDecoder* d;
  std::vector<std::thread> workers;
  std::deque<std::pair<AVFrame*, long>> jobs;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<long> in_flight{0};
  bool closing = false;
  uint8_t* buf;

  ConvPool(VimoDecoder* dec, uint8_t* out, int nthreads) : d(dec), buf(out) {
    for (int i = 0; i < nthreads; i++)
      workers.emplace_back([this] { run(); });
  }

  void run() {
    SwsContext* sws =
        sws_getContext(d->width, d->height, d->codec->pix_fmt, d->width,
                       d->height, AV_PIX_FMT_RGB24, SWS_FAST_BILINEAR,
                       nullptr, nullptr, nullptr);
    while (true) {
      std::pair<AVFrame*, long> job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [this] { return closing || !jobs.empty(); });
        if (jobs.empty()) break;  // closing and drained
        job = jobs.front();
        jobs.pop_front();
      }
      uint8_t* dp[1] = {buf + job.second * (long)d->height * d->width * 3};
      int dl[1] = {d->width * 3};
      if (sws)
        sws_scale(sws, job.first->data, job.first->linesize, 0, d->height, dp,
                  dl);
      av_frame_free(&job.first);
      in_flight.fetch_sub(1);
    }
    if (sws) sws_freeContext(sws);
  }

  void submit(const AVFrame* f, long slot) {
    AVFrame* clone = av_frame_clone(f);
    {
      std::lock_guard<std::mutex> lk(mu);
      jobs.emplace_back(clone, slot);
      in_flight.fetch_add(1);
    }
    cv.notify_one();
  }

  void finish() {
    {
      std::lock_guard<std::mutex> lk(mu);
      closing = true;
    }
    cv.notify_all();
    for (auto& t : workers) t.join();
  }
};

int conv_threads() {
  unsigned hw = std::thread::hardware_concurrency();
  return hw > 1 ? (int)(hw < 6 ? hw : 6) : 1;
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
      avcodec_parameters_to_context(d->codec, st->codecpar) < 0) {
    destroy(d);
    return nullptr;
  }
  // Multithreaded decode (frame + slice), auto thread count — without this
  // a software H.264/MPEG-4 decode runs on one core.
  d->codec->thread_count = 0;
  d->codec->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
  if (avcodec_open2(d->codec, dec, nullptr) < 0) {
    destroy(d);
    return nullptr;
  }
  d->width = d->codec->width;
  d->height = d->codec->height;
  d->time_base = st->time_base;
  AVRational fr = av_guess_frame_rate(d->fmt, st, nullptr);
  d->fps = fr.num > 0 && fr.den > 0 ? av_q2d(fr) : 30.0;
  d->start_pts = st->start_time != AV_NOPTS_VALUE ? st->start_time : 0;
  // Multithreaded YUV->RGB24 conversion: swscale's own threading needs the
  // AVOption-configured construction path (sws_getContext cannot set it).
  d->sws = sws_alloc_context();
  if (d->sws) {
    av_opt_set_int(d->sws, "srcw", d->width, 0);
    av_opt_set_int(d->sws, "srch", d->height, 0);
    av_opt_set_int(d->sws, "src_format", d->codec->pix_fmt, 0);
    av_opt_set_int(d->sws, "dstw", d->width, 0);
    av_opt_set_int(d->sws, "dsth", d->height, 0);
    av_opt_set_int(d->sws, "dst_format", AV_PIX_FMT_RGB24, 0);
    av_opt_set_int(d->sws, "sws_flags", SWS_FAST_BILINEAR, 0);
    av_opt_set_int(d->sws, "threads", 0, 0);  // auto
    if (sws_init_context(d->sws, nullptr, nullptr) < 0) {
      sws_freeContext(d->sws);
      d->sws = nullptr;
    }
  }
  if (!d->sws) {  // fallback: classic single-threaded context
    d->sws = sws_getContext(d->width, d->height, d->codec->pix_fmt, d->width,
                            d->height, AV_PIX_FMT_RGB24, SWS_FAST_BILINEAR,
                            nullptr, nullptr, nullptr);
  }
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
  bool pkt_pending = false;  // packet read but not yet accepted by the codec
  ConvPool pool(d, buf, conv_threads());
  while (produced < num) {
    if (!eof_sent && !pkt_pending) {
      int ret = av_read_frame(d->fmt, d->pkt);
      if (ret < 0) {
        avcodec_send_packet(d->codec, nullptr);  // flush
        eof_sent = true;
      } else if (d->pkt->stream_index != d->stream_idx) {
        av_packet_unref(d->pkt);
        continue;
      } else {
        pkt_pending = true;
      }
    }
    if (pkt_pending) {
      int ret = avcodec_send_packet(d->codec, d->pkt);
      if (ret == 0) {
        av_packet_unref(d->pkt);
        pkt_pending = false;
      } else if (ret != AVERROR(EAGAIN)) {
        av_packet_unref(d->pkt);
        pool.finish();
        return -2;
      }
      // EAGAIN: keep the packet, drain frames below, resend next iteration.
    }
    while (true) {
      int r = avcodec_receive_frame(d->codec, d->frame);
      if (r == AVERROR(EAGAIN)) break;
      if (r == AVERROR_EOF) {
        pool.finish();
        return produced;
      }
      if (r < 0) {
        pool.finish();
        return -3;
      }
      long idx = frame_index(d, d->frame, fallback_idx < 0 ? start : fallback_idx);
      if (fallback_idx >= 0) fallback_idx++;
      if (idx >= start && produced < num) {
        pool.submit(d->frame, produced);
        produced++;
        d->linear_next = idx + 1;
      }
      av_frame_unref(d->frame);
      if (produced == num) break;
    }
  }
  pool.finish();
  return produced;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Corpus decode pool: a native scheduler/executor that decodes MANY videos
// concurrently and hands frame blocks to one consumer — the C++ replacement
// for the extraction pipeline's Python worker threads (the reference has no
// equivalent; its hot loop is fully serialized, extract_embeddings.py:61-115).
// Python stays out of the decode path entirely: workers open/decode/convert
// and park ready blocks in a bounded queue; the consumer peeks (metadata)
// then takes (one memcpy into a caller-owned numpy buffer).
// ---------------------------------------------------------------------------

namespace {

struct PoolBlock {
  long job_id = 0;
  long n = 0;  // frames in this block
  int w = 0, h = 0;
  bool final_ = false;
  int err = 0;  // 0 ok; 1 open failed; 2 decode error; 3 no frames decoded
  std::vector<uint8_t> data;  // (n, h, w, 3)
};

struct PoolJob {
  long job_id;
  std::string path;
};

struct VimoPool {
  int chunk;
  size_t max_ready;
  std::vector<std::thread> workers;
  std::deque<PoolJob> jobs;
  std::deque<PoolBlock> ready;
  std::mutex mu;
  // Three condition variables, one per waiter class, so every notify_one
  // wakes a thread whose predicate can actually be true (a single shared CV
  // here caused lost-wakeup stalls: submit's notify could land on a worker
  // blocked for queue SPACE instead of one idle for JOBS).
  std::condition_variable cv_jobs;   // idle workers wait for jobs
  std::condition_variable cv_space;  // producing workers wait for queue space
  std::condition_variable cv_ready;  // consumer waits for blocks
  bool sealed = false;
  bool destroyed = false;  // teardown in progress: wake + bail everywhere
  long active = 0;  // jobs currently being decoded

  // Returns false when the pool is being destroyed (block dropped; the
  // caller should abandon its in-flight video so teardown is prompt).
  bool push_block(PoolBlock&& b) {
    std::unique_lock<std::mutex> lk(mu);
    cv_space.wait(lk, [this] { return ready.size() < max_ready || destroyed; });
    if (destroyed) return false;
    ready.push_back(std::move(b));
    cv_ready.notify_one();
    return true;
  }

  void run() {
    while (true) {
      PoolJob job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_jobs.wait(lk, [this] { return sealed || !jobs.empty(); });
        if (jobs.empty()) return;  // sealed and drained
        job = std::move(jobs.front());
        jobs.pop_front();
        active++;
      }
      decode_one(job);
      {
        std::lock_guard<std::mutex> lk(mu);
        active--;
      }
      cv_ready.notify_one();  // consumer may now observe drained state
    }
  }

  void decode_one(const PoolJob& job) {
    void* h = vimo_open(job.path.c_str());
    if (!h) {
      PoolBlock b;
      b.job_id = job.job_id;
      b.final_ = true;
      b.err = 1;
      push_block(std::move(b));
      return;
    }
    int w = 0, ht = 0;
    vimo_dims(h, &w, &ht);
    long pos = 0;
    const size_t frame_bytes = (size_t)w * ht * 3;
    while (true) {
      PoolBlock b;
      b.job_id = job.job_id;
      b.w = w;
      b.h = ht;
      b.data.resize((size_t)chunk * frame_bytes);
      long got = vimo_read_window(h, pos, chunk, b.data.data());
      if (got < 0) {
        b.data.clear();
        b.n = 0;
        b.final_ = true;
        b.err = 2;
        push_block(std::move(b));
        break;
      }
      b.n = got;
      b.data.resize((size_t)got * frame_bytes);
      pos += got;
      if (got < chunk) {  // EOF
        b.final_ = true;
        if (pos == 0) b.err = 3;  // nothing decoded at all
        push_block(std::move(b));
        break;
      }
      if (!push_block(std::move(b))) break;  // pool destroyed mid-video
    }
    vimo_close(h);
  }
};

}  // namespace

extern "C" {

void* vimo_pool_create(int workers, int chunk_frames, int max_ready) {
  auto* p = new VimoPool();
  p->chunk = chunk_frames > 0 ? chunk_frames : 128;
  p->max_ready = max_ready > 0 ? (size_t)max_ready : 16;
  int n = workers > 0 ? workers : (int)std::thread::hardware_concurrency();
  if (n < 1) n = 1;
  for (int i = 0; i < n; i++)
    p->workers.emplace_back([p] { p->run(); });
  return p;
}

int vimo_pool_submit(void* hp, long job_id, const char* path) {
  auto* p = static_cast<VimoPool*>(hp);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    if (p->sealed) return -1;
    p->jobs.push_back(PoolJob{job_id, path});
  }
  p->cv_jobs.notify_one();
  return 0;
}

void vimo_pool_seal(void* hp) {
  auto* p = static_cast<VimoPool*>(hp);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->sealed = true;
  }
  p->cv_jobs.notify_all();
}

// Wait for the next block. Returns 1 (block available; metadata filled) or
// 0 (pool sealed and fully drained — no more blocks will ever arrive, or the
// pool is being destroyed). Callers must not let peek/take RACE
// vimo_pool_destroy: destroy wakes blocked peekers via the destroyed flag,
// but once destroy is entered no new peek/take may be issued (the Python
// wrapper serializes consumer calls, satisfying this by construction).
int vimo_pool_peek(void* hp, long* job_id, long* n, int* w, int* h,
                   int* final_flag, int* err) {
  auto* p = static_cast<VimoPool*>(hp);
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_ready.wait(lk, [p] {
    return p->destroyed || !p->ready.empty() ||
           (p->sealed && p->jobs.empty() && p->active == 0);
  });
  if (p->destroyed || p->ready.empty()) return 0;
  const PoolBlock& b = p->ready.front();
  *job_id = b.job_id;
  *n = b.n;
  *w = b.w;
  *h = b.h;
  *final_flag = b.final_ ? 1 : 0;
  *err = b.err;
  return 1;
}

// Copy the peeked block's frames into out ((n, h, w, 3) uint8) and pop it.
// Returns the frame count (0 for empty/error blocks; out may be null then).
long vimo_pool_take(void* hp, void* out) {
  auto* p = static_cast<VimoPool*>(hp);
  PoolBlock b;
  {
    std::lock_guard<std::mutex> lk(p->mu);
    if (p->ready.empty()) return -1;
    b = std::move(p->ready.front());
    p->ready.pop_front();
  }
  p->cv_space.notify_one();  // freed exactly one queue slot
  if (b.n > 0 && out)
    std::memcpy(out, b.data.data(), b.data.size());
  return b.n;
}

// Tear the pool down. Pending (unstarted) jobs are dropped and workers
// abandon in-flight videos at their next block boundary, so teardown is
// prompt even with long videos queued. Blocked consumers in peek are woken
// and return 0, but the caller owns the higher-level contract that no NEW
// peek/take call races destroy (see vimo_pool_peek).
void vimo_pool_destroy(void* hp) {
  auto* p = static_cast<VimoPool*>(hp);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->sealed = true;
    p->destroyed = true;
    p->jobs.clear();
  }
  p->cv_jobs.notify_all();   // idle workers: sealed + drained -> exit
  p->cv_space.notify_all();  // producing workers: observe destroyed -> bail
  p->cv_ready.notify_all();  // blocked consumer: observe destroyed -> 0
  for (auto& t : p->workers) t.join();
  delete p;
}

}  // extern "C"
