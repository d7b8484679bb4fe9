// Native batch assembly for the training data path.
//
// The reference feeds its GPU trainers through torch DataLoader worker
// *processes* (training_loop_mi_multimodal.py:177-179).  On a TPU host a
// single controller assembles global batches; this translation unit is the
// hot inner loop of that path: gather N sample slices from memmapped
// shards into one contiguous float32 NHWC batch, applying the
// [0,255] -> [-1,1] normalisation and optional horizontal flips, fanned
// out over a persistent thread pool.
//
// Exposed as a plain C ABI consumed via ctypes (gantrack_tpu/data/native.py).
// Build: make -C native  (produces libgantrack_native.so)

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

class ThreadPool {
 public:
  explicit ThreadPool(int threads) : stop_(false), active_(0) {
    for (int i = 0; i < threads; ++i) {
      workers_.emplace_back([this] { Worker(); });
    }
  }

  ~ThreadPool() {
    {
      std::unique_lock<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void Submit(std::function<void()> fn) {
    {
      std::unique_lock<std::mutex> lock(mu_);
      queue_.push(std::move(fn));
    }
    cv_.notify_one();
  }

  void Wait() {
    std::unique_lock<std::mutex> lock(mu_);
    done_cv_.wait(lock, [this] { return queue_.empty() && active_ == 0; });
  }

 private:
  void Worker() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lock(mu_);
        cv_.wait(lock, [this] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        fn = std::move(queue_.front());
        queue_.pop();
        ++active_;
      }
      fn();
      {
        std::unique_lock<std::mutex> lock(mu_);
        --active_;
        if (queue_.empty() && active_ == 0) done_cv_.notify_all();
      }
    }
  }

  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> queue_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::condition_variable done_cv_;
  bool stop_;
  int active_;
};

ThreadPool* pool = nullptr;
std::mutex pool_mu;

ThreadPool* GetPool(int threads) {
  std::lock_guard<std::mutex> lock(pool_mu);
  if (pool == nullptr) {
    if (threads <= 0) {
      threads = static_cast<int>(std::thread::hardware_concurrency());
      if (threads <= 0) threads = 1;
    }
    pool = new ThreadPool(threads);
  }
  return pool;
}

// Copy one HWC sample, normalising and optionally mirroring.
void AssembleOne(const float* src, float* dst, int64_t h, int64_t w, int64_t c,
                 bool normalize, bool flip) {
  const float scale = 1.0f / 127.5f;
  if (!flip) {
    const int64_t n = h * w * c;
    if (normalize) {
      for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * scale - 1.0f;
    } else {
      std::memcpy(dst, src, n * sizeof(float));
    }
    return;
  }
  for (int64_t y = 0; y < h; ++y) {
    const float* srow = src + y * w * c;
    float* drow = dst + y * w * c;
    for (int64_t x = 0; x < w; ++x) {
      const float* spix = srow + (w - 1 - x) * c;
      float* dpix = drow + x * c;
      if (normalize) {
        for (int64_t ch = 0; ch < c; ++ch) dpix[ch] = spix[ch] * scale - 1.0f;
      } else {
        std::memcpy(dpix, spix, c * sizeof(float));
      }
    }
  }
}

}  // namespace

extern "C" {

// Gather `batch` samples from up to `num_shards` float32 shard base
// pointers into `out` [batch, h, w, c].
//   shard_ptrs:   array of base pointers, one per shard
//   shard_starts: global index of each shard's first sample (sorted)
//   indices:      [batch] global sample indices
//   flips:        [batch] 0/1 horizontal mirror flags (may be null)
void gantrack_assemble_batch(const float** shard_ptrs,
                             const int64_t* shard_starts, int64_t num_shards,
                             const int64_t* indices, const uint8_t* flips,
                             int64_t batch, int64_t h, int64_t w, int64_t c,
                             int normalize, float* out, int threads) {
  ThreadPool* tp = GetPool(threads);
  const int64_t sample_elems = h * w * c;
  for (int64_t i = 0; i < batch; ++i) {
    const int64_t gidx = indices[i];
    // binary search for owning shard
    int64_t lo = 0, hi = num_shards - 1;
    while (lo < hi) {
      int64_t mid = (lo + hi + 1) / 2;
      if (shard_starts[mid] <= gidx) lo = mid;
      else hi = mid - 1;
    }
    const float* src = shard_ptrs[lo] + (gidx - shard_starts[lo]) * sample_elems;
    float* dst = out + i * sample_elems;
    const bool flip = flips != nullptr && flips[i] != 0;
    tp->Submit([src, dst, h, w, c, normalize, flip] {
      AssembleOne(src, dst, h, w, c, normalize != 0, flip);
    });
  }
  tp->Wait();
}

}  // extern "C"
