// Native host-side input pipeline: shuffled batch assembly with
// multi-threaded prefetch.
//
// Role: the tf.data C++ runtime the reference leans on for input
// streaming (SURVEY.md §2.2 "tf.data streaming runtime"). The Python
// side registers feature columns as raw row-major buffers; worker
// threads assemble shuffled batches (row gathers) into a bounded queue
// off the GIL while the training loop consumes them. Exposed as a plain
// C API for ctypes (no pybind11 in this environment).
//
// Threading model: one shuffler (epoch permutation, done at start/reset)
// plus N producer threads, each assembling whole batches; a bounded
// blocking queue provides backpressure. Batch order across threads is
// nondeterministic unless num_threads == 1.

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Column {
  const uint8_t* data;      // caller-owned, row-major
  int64_t bytes_per_row;
};

struct Batch {
  std::vector<std::vector<uint8_t>> buffers;  // one per column
  int64_t num_rows;
};

class Loader {
 public:
  Loader(int64_t num_rows, int64_t batch_size, bool drop_remainder,
         bool shuffle, uint64_t seed, int num_threads,
         int queue_capacity)
      : num_rows_(num_rows),
        batch_size_(batch_size),
        drop_remainder_(drop_remainder),
        shuffle_(shuffle),
        seed_(seed),
        num_threads_(std::max(1, num_threads)),
        queue_capacity_(std::max(1, queue_capacity)) {}

  ~Loader() { Stop(); }

  void AddColumn(const void* data, int64_t bytes_per_row) {
    columns_.push_back(
        Column{static_cast<const uint8_t*>(data), bytes_per_row});
  }

  void Start() {
    Stop();
    perm_.resize(num_rows_);
    for (int64_t i = 0; i < num_rows_; ++i) perm_[i] = i;
    if (shuffle_) {
      std::mt19937_64 rng(seed_ + epoch_);
      std::shuffle(perm_.begin(), perm_.end(), rng);
    }
    int64_t full = num_rows_ / batch_size_;
    int64_t tail = num_rows_ % batch_size_;
    num_batches_ = full + ((tail != 0 && !drop_remainder_) ? 1 : 0);
    next_batch_.store(0);
    done_producing_.store(false);
    stop_.store(false);
    for (int t = 0; t < num_threads_; ++t) {
      workers_.emplace_back([this] { ProduceLoop(); });
    }
  }

  // Blocks until a batch is ready. Returns rows in the batch, or 0 when
  // the epoch is exhausted. The batch stays owned by the loader until
  // FreeBatch.
  int64_t Next(void** out_ptrs) {
    std::unique_lock<std::mutex> lock(mu_);
    consumer_cv_.wait(lock, [this] {
      return !queue_.empty() || AllProduced() || stop_.load();
    });
    if (queue_.empty()) return 0;
    current_ = std::move(queue_.front());
    queue_.pop_front();
    producer_cv_.notify_all();
    for (size_t c = 0; c < current_.buffers.size(); ++c) {
      out_ptrs[c] = current_.buffers[c].data();
    }
    return current_.num_rows;
  }

  void Reset(uint64_t epoch) {
    Stop();
    epoch_ = epoch;
  }

  int64_t num_columns() const {
    return static_cast<int64_t>(columns_.size());
  }
  int64_t batch_size() const { return batch_size_; }

 private:
  bool AllProduced() {
    return done_producing_.load() && outstanding_.load() == 0;
  }

  void ProduceLoop() {
    while (!stop_.load()) {
      // Claim credit BEFORE the ticket: a claimed-but-unqueued batch must
      // keep outstanding_ nonzero, or a sibling thread exhausting the
      // tickets could flip done_producing_ while this batch is in flight
      // and the consumer would observe AllProduced() with work pending.
      outstanding_.fetch_add(1);
      int64_t b = next_batch_.fetch_add(1);
      if (b >= num_batches_) {
        // Invalid ticket: release the credit, then flip the flag (this
        // order keeps AllProduced() conservative).
        outstanding_.fetch_sub(1);
        done_producing_.store(true);
        consumer_cv_.notify_all();
        return;
      }
      int64_t start = b * batch_size_;
      int64_t rows = std::min(batch_size_, num_rows_ - start);

      Batch batch;
      batch.num_rows = rows;
      batch.buffers.resize(columns_.size());
      for (size_t c = 0; c < columns_.size(); ++c) {
        const Column& col = columns_[c];
        batch.buffers[c].resize(rows * col.bytes_per_row);
        uint8_t* dst = batch.buffers[c].data();
        const int64_t* idx = perm_.data() + start;
        // Typed fast paths: a memcpy per 4/8-byte row defeats
        // vectorization; scalar loops let the compiler emit gathers.
        if (col.bytes_per_row == 4) {
          const uint32_t* src = reinterpret_cast<const uint32_t*>(col.data);
          uint32_t* d32 = reinterpret_cast<uint32_t*>(dst);
          for (int64_t r = 0; r < rows; ++r) d32[r] = src[idx[r]];
        } else if (col.bytes_per_row == 8) {
          const uint64_t* src = reinterpret_cast<const uint64_t*>(col.data);
          uint64_t* d64 = reinterpret_cast<uint64_t*>(dst);
          for (int64_t r = 0; r < rows; ++r) d64[r] = src[idx[r]];
        } else if (col.bytes_per_row % 8 == 0) {
          const int64_t words = col.bytes_per_row / 8;
          const uint64_t* src = reinterpret_cast<const uint64_t*>(col.data);
          uint64_t* d64 = reinterpret_cast<uint64_t*>(dst);
          for (int64_t r = 0; r < rows; ++r) {
            const uint64_t* s = src + idx[r] * words;
            uint64_t* d = d64 + r * words;
            for (int64_t w = 0; w < words; ++w) d[w] = s[w];
          }
        } else {
          for (int64_t r = 0; r < rows; ++r) {
            std::memcpy(dst + r * col.bytes_per_row,
                        col.data + idx[r] * col.bytes_per_row,
                        col.bytes_per_row);
          }
        }
      }

      std::unique_lock<std::mutex> lock(mu_);
      producer_cv_.wait(lock, [this] {
        return static_cast<int>(queue_.size()) < queue_capacity_ ||
               stop_.load();
      });
      if (stop_.load()) {
        outstanding_.fetch_sub(1);
        return;
      }
      queue_.push_back(std::move(batch));
      outstanding_.fetch_sub(1);
      consumer_cv_.notify_one();
    }
  }

  void Stop() {
    stop_.store(true);
    producer_cv_.notify_all();
    consumer_cv_.notify_all();
    for (auto& w : workers_) {
      if (w.joinable()) w.join();
    }
    workers_.clear();
    std::lock_guard<std::mutex> lock(mu_);
    queue_.clear();
    outstanding_.store(0);
  }

  const int64_t num_rows_;
  const int64_t batch_size_;
  const bool drop_remainder_;
  const bool shuffle_;
  const uint64_t seed_;
  const int num_threads_;
  const int queue_capacity_;

  std::vector<Column> columns_;
  std::vector<int64_t> perm_;
  int64_t num_batches_ = 0;
  uint64_t epoch_ = 0;

  std::atomic<int64_t> next_batch_{0};
  std::atomic<bool> done_producing_{false};
  std::atomic<int64_t> outstanding_{0};
  std::atomic<bool> stop_{false};

  std::mutex mu_;
  std::condition_variable consumer_cv_;
  std::condition_variable producer_cv_;
  std::deque<Batch> queue_;
  Batch current_;
  std::vector<std::thread> workers_;
};

}  // namespace

extern "C" {

void* loader_create(int64_t num_rows, int64_t batch_size,
                    int drop_remainder, int shuffle, uint64_t seed,
                    int num_threads, int queue_capacity) {
  return new Loader(num_rows, batch_size, drop_remainder != 0,
                    shuffle != 0, seed, num_threads, queue_capacity);
}

void loader_add_column(void* handle, const void* data,
                       int64_t bytes_per_row) {
  static_cast<Loader*>(handle)->AddColumn(data, bytes_per_row);
}

void loader_start(void* handle) { static_cast<Loader*>(handle)->Start(); }

int64_t loader_next(void* handle, void** out_ptrs) {
  return static_cast<Loader*>(handle)->Next(out_ptrs);
}

void loader_reset(void* handle, uint64_t epoch) {
  static_cast<Loader*>(handle)->Reset(epoch);
}

void loader_destroy(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"
