// detax native serving runtime: dynamic request batcher.
//
// This is the TPU-native equivalent of the reference repo's *named but
// never written* Rust inference server (reference README.md:2 promises
// "served in rust"; no .rs files exist — SURVEY.md §0). The hot serving
// loop needs a native, GIL-free component between network threads and the
// TPU step: requests arrive on many threads, get coalesced into fixed-size
// batches (full batch or timeout, whichever first), the TPU runner thread
// executes one XLA program per batch, and results fan back out to waiting
// request threads.
//
// Exposed as a plain C ABI consumed from Python via ctypes
// (detax/serve/batcher.py). No Python objects cross the boundary: requests
// and results are opaque byte buffers owned by the batcher.
//
// Also tracks end-to-end latency percentiles (p50/p90/p99) in a fixed-size
// reservoir — the "p50 request latency" metric of BASELINE.md.

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <new>
#include <unordered_map>
#include <vector>
#include <algorithm>

namespace {

using Clock = std::chrono::steady_clock;

double now_us() {
  return std::chrono::duration<double, std::micro>(Clock::now().time_since_epoch()).count();
}

struct Request {
  uint64_t id;
  std::vector<uint8_t> payload;
  double enqueue_us;
};

struct Result {
  std::vector<uint8_t> payload;
  bool ready = false;
};

struct LatencyStats {
  std::mutex mu;
  std::vector<double> samples;  // ring buffer
  size_t next = 0;
  size_t capacity = 1 << 14;
  uint64_t count = 0;

  void record(double us) {
    std::lock_guard<std::mutex> lock(mu);
    if (samples.size() < capacity) {
      samples.push_back(us);
    } else {
      samples[next] = us;
      next = (next + 1) % capacity;
    }
    ++count;
  }

  double percentile(double p) {
    std::lock_guard<std::mutex> lock(mu);
    if (samples.empty()) return 0.0;
    std::vector<double> copy(samples);
    size_t k = static_cast<size_t>(p / 100.0 * (copy.size() - 1));
    std::nth_element(copy.begin(), copy.begin() + k, copy.end());
    return copy[k];
  }

  void reset() {
    std::lock_guard<std::mutex> lock(mu);
    samples.clear();
    next = 0;
    count = 0;
  }
};

struct Batcher {
  size_t max_batch;
  double batch_timeout_us;

  std::mutex mu;
  std::condition_variable queue_cv;    // signaled on submit
  std::condition_variable result_cv;   // signaled on post_result
  std::deque<Request> queue;
  std::unordered_map<uint64_t, Result> results;
  std::unordered_map<uint64_t, double> inflight_enqueue_us;
  std::atomic<uint64_t> next_id{1};
  std::atomic<bool> shutdown{false};
  LatencyStats stats;
};

}  // namespace

extern "C" {

void* detax_batcher_create(size_t max_batch, double batch_timeout_us) {
  auto* b = new (std::nothrow) Batcher();
  if (!b) return nullptr;
  b->max_batch = max_batch;
  b->batch_timeout_us = batch_timeout_us;
  return b;
}

// Flag shutdown and wake every blocked thread (next_batch / wait_result
// return 0). Does NOT free the handle: callers must drain their own threads
// between shutdown and destroy, else a woken thread races the delete.
void detax_batcher_shutdown(void* handle) {
  auto* b = static_cast<Batcher*>(handle);
  {
    std::lock_guard<std::mutex> lock(b->mu);
    b->shutdown.store(true);
  }
  b->queue_cv.notify_all();
  b->result_cv.notify_all();
}

void detax_batcher_destroy(void* handle) {
  detax_batcher_shutdown(handle);
  delete static_cast<Batcher*>(handle);
}

// Submit a request payload; returns the assigned request id.
uint64_t detax_batcher_submit(void* handle, const uint8_t* data, size_t len) {
  auto* b = static_cast<Batcher*>(handle);
  Request r;
  r.id = b->next_id.fetch_add(1);
  r.payload.assign(data, data + len);
  r.enqueue_us = now_us();
  {
    std::lock_guard<std::mutex> lock(b->mu);
    b->inflight_enqueue_us[r.id] = r.enqueue_us;
    b->queue.push_back(std::move(r));
  }
  b->queue_cv.notify_one();
  return r.id;
}

// Runner side: collect up to max_batch requests. Blocks until at least one
// request is available, then waits at most batch_timeout_us for the batch to
// fill. Copies payloads into out_data (contiguous, each padded to item_stride
// bytes; payloads must not exceed item_stride) and ids into out_ids.
// Returns the number of requests collected (0 on shutdown).
size_t detax_batcher_next_batch2(void* handle, uint64_t* out_ids, uint8_t* out_data,
                                 size_t item_stride, uint64_t* out_lens);

size_t detax_batcher_next_batch(void* handle, uint64_t* out_ids, uint8_t* out_data,
                                size_t item_stride) {
  return detax_batcher_next_batch2(handle, out_ids, out_data, item_stride, nullptr);
}

// As next_batch, but also reports each payload's true byte length in
// out_lens (may be null). Lengths let the runner hand (pointer, len) views
// straight to the native jpeg batch decoder — no per-request copy or
// trailing-garbage scan on the hot path.
size_t detax_batcher_next_batch2(void* handle, uint64_t* out_ids, uint8_t* out_data,
                                 size_t item_stride, uint64_t* out_lens) {
  auto* b = static_cast<Batcher*>(handle);
  std::unique_lock<std::mutex> lock(b->mu);
  b->queue_cv.wait(lock, [&] { return b->shutdown.load() || !b->queue.empty(); });
  if (b->shutdown.load()) return 0;

  // batch-fill window: wait for more work until full or timeout
  auto deadline = Clock::now() + std::chrono::microseconds(
                                     static_cast<int64_t>(b->batch_timeout_us));
  while (b->queue.size() < b->max_batch && !b->shutdown.load()) {
    if (b->queue_cv.wait_until(lock, deadline) == std::cv_status::timeout) break;
  }

  size_t n = std::min(b->queue.size(), b->max_batch);
  for (size_t i = 0; i < n; ++i) {
    Request& r = b->queue.front();
    out_ids[i] = r.id;
    size_t len = std::min(r.payload.size(), item_stride);
    std::memcpy(out_data + i * item_stride, r.payload.data(), len);
    if (out_lens) out_lens[i] = len;
    b->queue.pop_front();
  }
  return n;
}

// Runner side: publish a result for a request id.
void detax_batcher_post_result(void* handle, uint64_t id, const uint8_t* data, size_t len) {
  auto* b = static_cast<Batcher*>(handle);
  double enq = 0.0;
  {
    std::lock_guard<std::mutex> lock(b->mu);
    Result& res = b->results[id];
    res.payload.assign(data, data + len);
    res.ready = true;
    auto it = b->inflight_enqueue_us.find(id);
    if (it != b->inflight_enqueue_us.end()) {
      enq = it->second;
      b->inflight_enqueue_us.erase(it);
    }
  }
  if (enq > 0.0) b->stats.record(now_us() - enq);
  b->result_cv.notify_all();
}

// Client side: block until the result for id is ready; copies at most
// max_len bytes into out and returns the actual result size (0 on shutdown).
size_t detax_batcher_wait_result(void* handle, uint64_t id, uint8_t* out, size_t max_len) {
  auto* b = static_cast<Batcher*>(handle);
  std::unique_lock<std::mutex> lock(b->mu);
  b->result_cv.wait(lock, [&] {
    if (b->shutdown.load()) return true;
    auto it = b->results.find(id);
    return it != b->results.end() && it->second.ready;
  });
  if (b->shutdown.load()) return 0;
  auto it = b->results.find(id);
  size_t n = std::min(it->second.payload.size(), max_len);
  std::memcpy(out, it->second.payload.data(), n);
  b->results.erase(it);
  return n;
}

size_t detax_batcher_pending(void* handle) {
  auto* b = static_cast<Batcher*>(handle);
  std::lock_guard<std::mutex> lock(b->mu);
  return b->queue.size();
}

double detax_batcher_latency_percentile(void* handle, double p) {
  return static_cast<Batcher*>(handle)->stats.percentile(p);
}

uint64_t detax_batcher_completed(void* handle) {
  return static_cast<Batcher*>(handle)->stats.count;
}

// Zero the latency reservoir and completion counter — load tests call this
// between runs so published percentiles cover exactly one measurement
// window (VERDICT-r4 "per-run-reset server stats").
void detax_batcher_reset_stats(void* handle) {
  static_cast<Batcher*>(handle)->stats.reset();
}

}  // extern "C"
