// CPU brute-force k-NN baseline for bench.py.
//
// Measures what the reference's single-threaded AVX-512 flat-index scan
// achieves on this host (docs/benchmarks.md BF TopK methodology: one query
// at a time, full scan, bounded heap). Compiled with -O3 -march=native so
// the dot-product loop auto-vectorizes to AVX-512 FMA. This is our own
// minimal implementation, not reference code — it exists only to produce an
// honest measured "vs_baseline" denominator on the bench host.
//
// Usage: bf_baseline <n> <dim> <k> <n_queries>
// Prints: {"cpu_qps": <float>}

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <queue>
#include <random>
#include <vector>

static float dot(const float *a, const float *b, size_t d) {
  float acc0 = 0.f, acc1 = 0.f, acc2 = 0.f, acc3 = 0.f;
  size_t i = 0;
#pragma GCC ivdep
  for (; i + 4 <= d; i += 4) {
    acc0 += a[i] * b[i];
    acc1 += a[i + 1] * b[i + 1];
    acc2 += a[i + 2] * b[i + 2];
    acc3 += a[i + 3] * b[i + 3];
  }
  for (; i < d; ++i) acc0 += a[i] * b[i];
  return (acc0 + acc1) + (acc2 + acc3);
}

int main(int argc, char **argv) {
  size_t n = argc > 1 ? strtoull(argv[1], nullptr, 10) : 1000000;
  size_t dim = argc > 2 ? strtoull(argv[2], nullptr, 10) : 768;
  size_t k = argc > 3 ? strtoull(argv[3], nullptr, 10) : 10;
  size_t nq = argc > 4 ? strtoull(argv[4], nullptr, 10) : 10;

  std::mt19937 rng(42);
  std::normal_distribution<float> dist;
  std::vector<float> data(n * dim), queries(nq * dim);
  for (auto &x : data) x = dist(rng);
  for (auto &x : queries) x = dist(rng);

  volatile float sink = 0.f;
  auto t0 = std::chrono::steady_clock::now();
  for (size_t qi = 0; qi < nq; ++qi) {
    const float *q = &queries[qi * dim];
    // max-heap of (score, id), keep k smallest "1 - dot" scores
    std::priority_queue<std::pair<float, uint32_t>> heap;
    for (size_t i = 0; i < n; ++i) {
      float s = 1.0f - dot(q, &data[i * dim], dim);
      if (heap.size() < k) {
        heap.emplace(s, (uint32_t)i);
      } else if (s < heap.top().first) {
        heap.pop();
        heap.emplace(s, (uint32_t)i);
      }
    }
    sink += heap.top().first;
  }
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  printf("{\"cpu_qps\": %.4f}\n", (double)nq / secs);
  (void)sink;
  return 0;
}
