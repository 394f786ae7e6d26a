// Bounded threadsafe FIFO with blocking/non-blocking push/pop and a
// drop-oldest-if-full policy.
//
// Native equivalent of the reference's okvis::threadsafe::Queue
// (okvis_multisensor_processing/include/okvis/threadsafe/
// ThreadsafeQueue.hpp:60-338), re-implemented with std::mutex /
// std::condition_variable instead of raw pthreads. Used by the native
// dataset loader's prefetcher; the Python pipeline talks to it through
// the C API in dataloader.cpp.

#pragma once

#include <condition_variable>
#include <deque>
#include <mutex>

namespace okvis2tpu {

template <typename T>
class ThreadsafeQueue {
 public:
  explicit ThreadsafeQueue(size_t capacity = 0) : capacity_(capacity) {}

  void Shutdown() {
    {
      std::lock_guard<std::mutex> lk(mutex_);
      shutdown_ = true;
    }
    not_empty_.notify_all();
    not_full_.notify_all();
  }

  bool PushBlockingIfFull(T value) {
    std::unique_lock<std::mutex> lk(mutex_);
    not_full_.wait(lk, [&] {
      return shutdown_ || capacity_ == 0 || queue_.size() < capacity_;
    });
    if (shutdown_) return false;
    queue_.push_back(std::move(value));
    lk.unlock();
    not_empty_.notify_one();
    return true;
  }

  // Returns true if an element was dropped to make room.
  bool PushNonBlockingDroppingIfFull(T value) {
    bool dropped = false;
    {
      std::lock_guard<std::mutex> lk(mutex_);
      if (shutdown_) return false;
      if (capacity_ > 0 && queue_.size() >= capacity_) {
        queue_.pop_front();
        dropped = true;
      }
      queue_.push_back(std::move(value));
    }
    not_empty_.notify_one();
    return dropped;
  }

  bool PopBlocking(T* out) {
    std::unique_lock<std::mutex> lk(mutex_);
    not_empty_.wait(lk, [&] { return shutdown_ || !queue_.empty(); });
    if (queue_.empty()) return false;  // shutdown
    *out = std::move(queue_.front());
    queue_.pop_front();
    lk.unlock();
    not_full_.notify_one();
    return true;
  }

  bool PopNonBlocking(T* out) {
    std::lock_guard<std::mutex> lk(mutex_);
    if (queue_.empty()) return false;
    *out = std::move(queue_.front());
    queue_.pop_front();
    not_full_.notify_one();
    return true;
  }

  size_t Size() const {
    std::lock_guard<std::mutex> lk(mutex_);
    return queue_.size();
  }

 private:
  mutable std::mutex mutex_;
  std::condition_variable not_empty_;
  std::condition_variable not_full_;
  std::deque<T> queue_;
  size_t capacity_;
  bool shutdown_ = false;
};

}  // namespace okvis2tpu
