// Native host runtime for vectorsimilarity_tpu.
//
// The TPU owns the compute path (JAX/XLA/Pallas); this library owns the
// host-side runtime around it, mirroring the native layers of the reference
// design (SURVEY.md L1/L5: containers/bookkeeping in C++, job execution via
// a worker pool). Exposed as a plain C ABI consumed through ctypes
// (vectorsimilarity_tpu/native_bridge.py):
//
//   - graph bookkeeping over the SoA adjacency buffers shared with numpy
//     (zero-copy): referrer scans for delete/repair, swap-rename rewrites,
//     reverse-edge application with overflow detection — the host half of
//     the graph builder;
//   - a job queue + worker pool (the scheduler): callback-based so Python
//     (ctypes trampolines re-acquire the GIL) or native jobs both work.
//
// Everything here operates on int32 adjacency rows [n_rows, m] padded with
// -1, exactly the layout the device kernels consume.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Graph bookkeeping (SoA adjacency helpers)
// ---------------------------------------------------------------------------

// Scan rows [0, n_rows) for any link == target; append matching row ids to
// out (capacity out_cap). Returns the number of referrers found (may exceed
// out_cap; only out_cap are written).
int64_t vs_find_referrers(const int32_t *links, int64_t n_rows, int64_t m,
                          int32_t target, int32_t *out, int64_t out_cap) {
  int64_t found = 0;
  for (int64_t r = 0; r < n_rows; ++r) {
    const int32_t *row = links + r * m;
    for (int64_t j = 0; j < m; ++j) {
      if (row[j] == target) {
        if (found < out_cap) out[found] = (int32_t)r;
        ++found;
        break;
      }
    }
  }
  return found;
}

// Find referrers of `target` among MULTIPLE targets at once: for each link
// value v in `targets[0..n_targets)`, append (row, target_index) pairs.
// Used to batch delete repairs. Returns pair count (<= out_cap).
int64_t vs_find_referrers_multi(const int32_t *links, int64_t n_rows, int64_t m,
                                const int32_t *targets, int64_t n_targets,
                                int32_t *out_rows, int32_t *out_tidx,
                                int64_t out_cap) {
  // Build a lookup for small target sets; linear probe otherwise.
  int64_t found = 0;
  for (int64_t r = 0; r < n_rows; ++r) {
    const int32_t *row = links + r * m;
    for (int64_t j = 0; j < m; ++j) {
      int32_t v = row[j];
      if (v < 0) continue;
      for (int64_t t = 0; t < n_targets; ++t) {
        if (v == targets[t]) {
          if (found < out_cap) {
            out_rows[found] = (int32_t)r;
            out_tidx[found] = (int32_t)t;
          }
          ++found;
          goto next_row;
        }
      }
    }
  next_row:;
  }
  return found;
}

// Replace every occurrence of old_id with new_id across all rows (the
// swap-with-last rename). Returns the number of rewritten cells.
int64_t vs_rewrite_id(int32_t *links, int64_t n_rows, int64_t m,
                      int32_t old_id, int32_t new_id) {
  int64_t rewritten = 0;
  for (int64_t r = 0; r < n_rows; ++r) {
    int32_t *row = links + r * m;
    for (int64_t j = 0; j < m; ++j) {
      if (row[j] == old_id) {
        row[j] = new_id;
        ++rewritten;
      }
    }
  }
  return rewritten;
}

// Apply reverse edges: for each (neighbor, new_node) pair, append new_node
// to neighbor's row when there is room and the edge is absent. Rows that
// overflow are reported in out_overflow (dedup'd). Touched rows are
// reported in out_dirty. Returns the overflow count.
int64_t vs_apply_reverse_edges(int32_t *links, int32_t *nlinks, int64_t m,
                               const int32_t *pairs /* [n,2] */, int64_t n,
                               int32_t *out_overflow, int64_t overflow_cap,
                               int32_t *out_dirty, int64_t dirty_cap,
                               int64_t *dirty_count_out) {
  int64_t n_overflow = 0;
  int64_t n_dirty = 0;
  for (int64_t i = 0; i < n; ++i) {
    int32_t nb = pairs[2 * i];
    int32_t node = pairs[2 * i + 1];
    if (nb == node) continue;
    int32_t *row = links + (int64_t)nb * m;
    int32_t cnt = nlinks[nb];
    bool present = false;
    for (int32_t j = 0; j < cnt; ++j) {
      if (row[j] == node) { present = true; break; }
    }
    if (present) continue;
    if (cnt < m) {
      row[cnt] = node;
      nlinks[nb] = cnt + 1;
      if (n_dirty < dirty_cap) out_dirty[n_dirty] = nb;
      ++n_dirty;
    } else {
      bool seen = false;
      for (int64_t k = 0; k < n_overflow && k < overflow_cap; ++k) {
        if (out_overflow[k] == nb) { seen = true; break; }
      }
      if (!seen) {
        if (n_overflow < overflow_cap) out_overflow[n_overflow] = nb;
        ++n_overflow;
      }
    }
  }
  *dirty_count_out = n_dirty;
  return n_overflow;
}

// ---------------------------------------------------------------------------
// Job queue + worker pool (the scheduler / async runtime)
// ---------------------------------------------------------------------------

typedef void (*vs_job_fn)(void *arg);

struct VsPool {
  std::deque<std::pair<vs_job_fn, void *>> queue;
  std::mutex mu;
  std::condition_variable cv;
  std::condition_variable quiescent;
  std::vector<std::thread> threads;
  std::atomic<int64_t> in_flight{0};
  bool stop = false;

  explicit VsPool(int n) {
    for (int i = 0; i < n; ++i) {
      threads.emplace_back([this] { worker(); });
    }
  }

  void worker() {
    for (;;) {
      std::pair<vs_job_fn, void *> job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv.wait(lk, [this] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        job = queue.front();
        queue.pop_front();
      }
      job.first(job.second);
      if (in_flight.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(mu);
        quiescent.notify_all();
      }
    }
  }

  void submit(vs_job_fn fn, void *arg) {
    in_flight.fetch_add(1);
    {
      std::lock_guard<std::mutex> lk(mu);
      queue.emplace_back(fn, arg);
    }
    cv.notify_one();
  }

  bool wait(int64_t timeout_ms) {
    std::unique_lock<std::mutex> lk(mu);
    auto pred = [this] { return in_flight.load() == 0; };
    if (timeout_ms < 0) {
      quiescent.wait(lk, pred);
      return true;
    }
    return quiescent.wait_for(lk, std::chrono::milliseconds(timeout_ms), pred);
  }

  ~VsPool() {
    {
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv.notify_all();
    for (auto &t : threads) t.join();
  }
};

void *vs_pool_create(int num_threads) { return new VsPool(num_threads); }

void vs_pool_submit(void *pool, vs_job_fn fn, void *arg) {
  static_cast<VsPool *>(pool)->submit(fn, arg);
}

int vs_pool_wait(void *pool, int64_t timeout_ms) {
  return static_cast<VsPool *>(pool)->wait(timeout_ms) ? 1 : 0;
}

int64_t vs_pool_in_flight(void *pool) {
  return static_cast<VsPool *>(pool)->in_flight.load();
}

void vs_pool_destroy(void *pool) { delete static_cast<VsPool *>(pool); }

}  // extern "C"
