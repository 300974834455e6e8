// Native (C++) video decode pipeline for the vgen-tpu host input path.
//
// TPU-native replacement for the reference's per-worker Python decode
// (reference: tools/datasets/video_dataset.py:62-94 — cv2.VideoCapture
// inside torch DataLoader workers). Here the ENTIRE per-video decode —
// open, fps-stride sampling, BGR->RGB, contiguous packing — is one C++
// call that never touches the Python GIL, so a thread pool feeding a
// multi-chip host achieves real parallel decode. Exposed as a C ABI for
// ctypes (no pybind11 in this environment).
//
// Build: make -C native   (g++ + pkg-config opencv4; see native/Makefile)

#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

#include <condition_variable>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct DecodeResult {
  unsigned char* data = nullptr;  // [f, h, w, 3] RGB, contiguous
  int f = 0, h = 0, w = 0;
  bool ok = false;
};

// Mirrors vgen_tpu.data.video_io.read_video_frames: stride =
// max(1, round(src_fps / sample_fps)); keep every stride-th frame;
// stop after max_frames kept frames when max_frames > 0.
DecodeResult decode_one(const std::string& path, double sample_fps,
                        int max_frames) {
  DecodeResult r;
  cv::VideoCapture cap(path);
  if (!cap.isOpened()) return r;
  double src_fps = cap.get(cv::CAP_PROP_FPS);
  if (src_fps <= 0) src_fps = 30.0;
  long stride = 1;
  if (sample_fps > 0) {
    // nearbyint = round-half-to-EVEN, matching Python round() in the
    // cv2 path (std::lround rounds half away from zero: at an exact
    // .5 fps ratio, e.g. 25/10, the two paths would pick different
    // strides and sample different frames)
    stride = (long)std::nearbyint(src_fps / sample_fps);
    if (stride < 1) stride = 1;
  }
  std::vector<cv::Mat> frames;
  cv::Mat bgr;
  long idx = 0;
  while (cap.read(bgr)) {
    if (idx % stride == 0) {
      cv::Mat rgb;
      cv::cvtColor(bgr, rgb, cv::COLOR_BGR2RGB);
      frames.push_back(std::move(rgb));
      if (max_frames > 0 && (int)frames.size() >= max_frames) break;
    }
    ++idx;
  }
  cap.release();
  if (frames.empty()) return r;

  r.f = (int)frames.size();
  r.h = frames[0].rows;
  r.w = frames[0].cols;
  size_t frame_bytes = (size_t)r.h * r.w * 3;
  r.data = (unsigned char*)std::malloc((size_t)r.f * frame_bytes);
  if (!r.data) return r;
  for (int i = 0; i < r.f; ++i) {
    const cv::Mat& m = frames[i];
    if (m.rows != r.h || m.cols != r.w) {  // codec hiccup: bail
      std::free(r.data);
      r.data = nullptr;
      return r;
    }
    if (m.isContinuous()) {
      std::memcpy(r.data + (size_t)i * frame_bytes, m.data, frame_bytes);
    } else {
      for (int y = 0; y < r.h; ++y)
        std::memcpy(r.data + (size_t)i * frame_bytes + (size_t)y * r.w * 3,
                    m.ptr(y), (size_t)r.w * 3);
    }
  }
  r.ok = true;
  return r;
}

struct Job {
  long ticket;
  std::string path;
  double sample_fps;
  int max_frames;
};

struct Pool {
  std::vector<std::thread> threads;
  std::deque<Job> jobs;
  std::unordered_map<long, DecodeResult> results;
  std::mutex mu;
  std::condition_variable cv_job, cv_done;
  long next_ticket = 1;
  bool stopping = false;

  explicit Pool(int n) {
    for (int i = 0; i < n; ++i)
      threads.emplace_back([this] { worker(); });
  }

  void worker() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_job.wait(lk, [this] { return stopping || !jobs.empty(); });
        if (stopping && jobs.empty()) return;
        job = std::move(jobs.front());
        jobs.pop_front();
      }
      DecodeResult r = decode_one(job.path, job.sample_fps, job.max_frames);
      {
        std::lock_guard<std::mutex> lk(mu);
        results[job.ticket] = r;
      }
      cv_done.notify_all();
    }
  }

  long submit(const char* path, double fps, int max_frames) {
    std::lock_guard<std::mutex> lk(mu);
    long t = next_ticket++;
    jobs.push_back(Job{t, path, fps, max_frames});
    cv_job.notify_one();
    return t;
  }

  DecodeResult fetch(long ticket) {
    std::unique_lock<std::mutex> lk(mu);
    cv_done.wait(lk, [&] { return results.count(ticket) > 0; });
    DecodeResult r = results[ticket];
    results.erase(ticket);
    return r;
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stopping = true;
    }
    cv_job.notify_all();
    for (auto& t : threads) t.join();
    for (auto& kv : results)
      if (kv.second.data) std::free(kv.second.data);
  }
};

}  // namespace

extern "C" {

// Single blocking decode. Returns malloc'd [f,h,w,3] RGB or nullptr.
unsigned char* vd_decode(const char* path, double sample_fps, int max_frames,
                         int* out_f, int* out_h, int* out_w) {
  DecodeResult r = decode_one(path, sample_fps, max_frames);
  if (!r.ok) return nullptr;
  *out_f = r.f;
  *out_h = r.h;
  *out_w = r.w;
  return r.data;
}

void vd_free(unsigned char* p) { std::free(p); }

void* vd_pool_new(int num_threads) {
  if (num_threads < 1) num_threads = 1;
  return new Pool(num_threads);
}

void vd_pool_free(void* pool) { delete (Pool*)pool; }

long vd_submit(void* pool, const char* path, double sample_fps,
               int max_frames) {
  return ((Pool*)pool)->submit(path, sample_fps, max_frames);
}

// Blocks until the ticket's decode finishes. Returns malloc'd buffer
// (caller frees with vd_free) or nullptr on decode failure.
unsigned char* vd_fetch(void* pool, long ticket, int* out_f, int* out_h,
                        int* out_w) {
  DecodeResult r = ((Pool*)pool)->fetch(ticket);
  if (!r.ok) return nullptr;
  *out_f = r.f;
  *out_h = r.h;
  *out_w = r.w;
  return r.data;
}

}  // extern "C"
