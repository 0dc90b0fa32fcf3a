// Native demo-video decoder: libavformat/libavcodec/libswscale -> RGB24.
//
// TPU-native replacement for the reference's ffmpeg subprocess + imageio
// decode path (gym/monitoring/video_recorder.py:237-288 encode,
// scripts/train_script.py:67 decode): frames are decoded in-process into one
// contiguous uint8 [T, H, W, 3] buffer that python hands straight to the
// device-side preprocessing graph — no pipe, no per-frame python hop.
//
// C ABI (consumed by ctypes in binding.py):
//   vd_decode(path, &buf, &T, &H, &W, &handle) -> 0 on success, negative code
//       buf points INTO the handle's storage (no duplicate copy); the caller
//       copies out and then calls vd_free_handle(handle)
//   vd_free_handle(handle)
//   vd_frame_count(path)              -> quick container probe
//
// Build: see build.sh (g++ -shared, links system libav*).

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

struct DecoderCtx {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  SwsContext* sws = nullptr;
  AVFrame* frame = nullptr;
  AVFrame* rgb = nullptr;
  AVPacket* pkt = nullptr;
  int stream_index = -1;

  ~DecoderCtx() {
    if (pkt) av_packet_free(&pkt);
    if (rgb) {
      if (rgb->data[0]) av_freep(&rgb->data[0]);
      av_frame_free(&rgb);
    }
    if (frame) av_frame_free(&frame);
    if (sws) sws_freeContext(sws);
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
  }

  int open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -2;
    const AVCodec* dec = nullptr;
    stream_index = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &dec, 0);
    if (stream_index < 0 || !dec) return -3;
    codec = avcodec_alloc_context3(dec);
    if (!codec) return -4;
    if (avcodec_parameters_to_context(codec, fmt->streams[stream_index]->codecpar) < 0)
      return -5;
    if (avcodec_open2(codec, dec, nullptr) < 0) return -6;
    frame = av_frame_alloc();
    rgb = av_frame_alloc();
    pkt = av_packet_alloc();
    if (!frame || !rgb || !pkt) return -7;
    return 0;
  }
};

// Convert one decoded frame to tightly-packed RGB24 appended to `out`.
int push_rgb(DecoderCtx& c, std::vector<uint8_t>& out, int& H, int& W) {
  const int h = c.frame->height, w = c.frame->width;
  if (H == 0) {
    H = h;
    W = w;
  } else if (h != H || w != W) {
    return -20;  // variable frame size unsupported
  }
  if (!c.sws) {
    c.sws = sws_getContext(w, h, (AVPixelFormat)c.frame->format, w, h,
                           AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr, nullptr);
    if (!c.sws) return -21;
  }
  // sws_scale's SIMD paths write whole vector lanes and can touch bytes
  // beyond a w*3-tight row (heap corruption for odd/unaligned widths, e.g.
  // 299x299 inception demos) — scale into an av_image_alloc'd scratch frame
  // (aligned, padded linesize) and copy rows tightly into the output.
  if (!c.rgb->data[0]) {
    if (av_image_alloc(c.rgb->data, c.rgb->linesize, w, h, AV_PIX_FMT_RGB24, 64) < 0)
      return -22;
  }
  sws_scale(c.sws, c.frame->data, c.frame->linesize, 0, h, c.rgb->data, c.rgb->linesize);
  const size_t off = out.size();
  out.resize(off + (size_t)h * w * 3);
  for (int y = 0; y < h; ++y)
    std::memcpy(out.data() + off + (size_t)y * w * 3,
                c.rgb->data[0] + (size_t)y * c.rgb->linesize[0], (size_t)w * 3);
  return 0;
}

}  // namespace

extern "C" {

int vd_decode(const char* path, uint8_t** out_buf, int* out_t, int* out_h, int* out_w,
              void** out_handle) {
  DecoderCtx c;
  int rc = c.open(path);
  if (rc != 0) return rc;

  auto* out_vec = new std::vector<uint8_t>();
  std::vector<uint8_t>& out = *out_vec;
  int T = 0, H = 0, W = 0;
  // a 500-frame 299x299 video is ~134 MB: hand the vector's own storage
  // across the ABI instead of malloc+memcpy'ing a duplicate, and reserve
  // from the container's frame count to avoid doubling-growth slack
  struct Guard { std::vector<uint8_t>* v; ~Guard() { delete v; } } guard{out_vec};
  const int64_t nb = c.fmt->streams[c.stream_index]->nb_frames;

  auto drain = [&](void) -> int {
    while (true) {
      int r = avcodec_receive_frame(c.codec, c.frame);
      if (r == AVERROR(EAGAIN) || r == AVERROR_EOF) return 0;
      if (r < 0) return -10;
      const bool first = (H == 0);
      r = push_rgb(c, out, H, W);
      if (r != 0) return r;
      if (first && nb > 0) out.reserve((size_t)nb * H * W * 3);
      ++T;
    }
  };

  while (av_read_frame(c.fmt, c.pkt) >= 0) {
    if (c.pkt->stream_index == c.stream_index) {
      int sr = avcodec_send_packet(c.codec, c.pkt);
      if (sr == AVERROR(EAGAIN)) {
        // decoder output full: drain queued frames, then the packet MUST be
        // resent (dropping it would silently shorten the video)
        rc = drain();
        if (rc == 0) sr = avcodec_send_packet(c.codec, c.pkt);
        if (rc != 0 || sr < 0) {
          av_packet_unref(c.pkt);
          return rc != 0 ? rc : -13;
        }
      } else if (sr < 0) {
        // corrupt packet: fail loudly — a silent skip would truncate the
        // demo and (via the reward engine's min-T alignment) every other one
        av_packet_unref(c.pkt);
        return -13;
      }
      rc = drain();
      if (rc != 0) {
        av_packet_unref(c.pkt);
        return rc;
      }
    }
    av_packet_unref(c.pkt);
  }
  avcodec_send_packet(c.codec, nullptr);  // flush
  rc = drain();
  if (rc != 0) return rc;
  if (T == 0) return -11;

  guard.v = nullptr;  // ownership moves to the caller's handle
  *out_buf = out.data();
  *out_t = T;
  *out_h = H;
  *out_w = W;
  *out_handle = out_vec;
  return 0;
}

void vd_free_handle(void* h) { delete static_cast<std::vector<uint8_t>*>(h); }

int vd_frame_count(const char* path) {
  DecoderCtx c;
  if (c.open(path) != 0) return -1;
  int64_t n = c.fmt->streams[c.stream_index]->nb_frames;
  return (int)n;  // 0 when the container doesn't record it
}

}  // extern "C"
