// tpuva native runtime: frame-batch assembly ring buffer + pixel kernels.
//
// The reference's native surface was OpenCV's C++ (SURVEY.md §2.2); the
// rebuild's host runtime keeps the decode loop in cv2 but moves the
// per-frame staging work (batch assembly memcpy, BGR->gray conversion)
// into this small C++ library so it runs off the GIL under the decode
// thread. Exposed with a plain C ABI for ctypes (no pybind11 in this
// environment).
//
// Ring-buffer protocol (single producer, single consumer):
//   h = tv_batcher_create(frame_bytes, batch, depth)
//   producer: tv_batcher_push_frame(h, frame) x T, then tv_batcher_close(h)
//   consumer: n = tv_batcher_pop_batch(h, out)  // n<=batch valid frames,
//             0 = stream ended, -1 = error
//   tv_batcher_destroy(h)

#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <vector>

namespace {

struct Batcher {
  size_t frame_bytes;
  int batch;
  int depth;
  bool closed = false;

  std::mutex mu;
  std::condition_variable cv_push;
  std::condition_variable cv_pop;

  // staging batch being filled by the producer
  std::vector<uint8_t> staging;
  int staged = 0;

  // completed batches awaiting the consumer
  std::deque<std::pair<std::vector<uint8_t>, int>> ready;

  Batcher(size_t fb, int b, int d) : frame_bytes(fb), batch(b), depth(d) {
    staging.resize(frame_bytes * batch);
  }

  void seal_staging_locked() {
    if (staged == 0) return;
    // pad the tail batch by repeating the last frame (shape-stable form)
    for (int i = staged; i < batch; ++i) {
      std::memcpy(staging.data() + i * frame_bytes,
                  staging.data() + (staged - 1) * frame_bytes, frame_bytes);
    }
    ready.emplace_back(std::move(staging), staged);
    staging.assign(frame_bytes * batch, 0);
    staged = 0;
    cv_pop.notify_one();
  }
};

}  // namespace

extern "C" {

void* tv_batcher_create(size_t frame_bytes, int batch, int depth) {
  return new Batcher(frame_bytes, batch, depth);
}

int tv_batcher_push_frame(void* h, const uint8_t* data) {
  auto* b = static_cast<Batcher*>(h);
  std::unique_lock<std::mutex> lk(b->mu);
  if (b->closed) return -1;
  std::memcpy(b->staging.data() + b->staged * b->frame_bytes, data,
              b->frame_bytes);
  if (++b->staged == b->batch) {
    b->cv_push.wait(lk, [&] {
      return (int)b->ready.size() < b->depth || b->closed;
    });
    if (b->closed) return -1;
    b->seal_staging_locked();
  }
  return 0;
}

// returns n_valid (>0), 0 on clean end-of-stream, -1 on error
int tv_batcher_pop_batch(void* h, uint8_t* out) {
  auto* b = static_cast<Batcher*>(h);
  std::unique_lock<std::mutex> lk(b->mu);
  b->cv_pop.wait(lk, [&] { return !b->ready.empty() || b->closed; });
  if (b->ready.empty()) return 0;  // closed and drained
  auto item = std::move(b->ready.front());
  b->ready.pop_front();
  b->cv_push.notify_one();
  lk.unlock();
  std::memcpy(out, item.first.data(), b->frame_bytes * b->batch);
  return item.second;
}

void tv_batcher_close(void* h) {
  auto* b = static_cast<Batcher*>(h);
  std::lock_guard<std::mutex> lk(b->mu);
  b->seal_staging_locked();
  b->closed = true;
  b->cv_pop.notify_all();
  b->cv_push.notify_all();
}

int tv_batcher_depth(void* h) {
  auto* b = static_cast<Batcher*>(h);
  std::lock_guard<std::mutex> lk(b->mu);
  return (int)b->ready.size();
}

void tv_batcher_destroy(void* h) { delete static_cast<Batcher*>(h); }

// BGR (interleaved, uint8) -> gray, OpenCV's exact fixed-point weights:
// gray = (1868*B + 9617*G + 4899*R + 8192) >> 14  (cvtColor BGR2GRAY)
void tv_bgr2gray(const uint8_t* src, uint8_t* dst, size_t npx) {
  for (size_t i = 0; i < npx; ++i) {
    const uint8_t* p = src + 3 * i;
    dst[i] =
        (uint8_t)((1868u * p[0] + 9617u * p[1] + 4899u * p[2] + 8192u) >> 14);
  }
}

}  // extern "C"
