#!/bin/bash
# Sequential TPU benchmark chain (one tunnel client at a time).
cd /root/repo
mkdir -p bench_out
log=bench_out/chain.log
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date +%T)" >> "$log"
  timeout "$tmo" python "$@" > "bench_out/$name.jsonl" 2> "bench_out/$name.err"
  echo "=== $name exit=$? $(date +%T)" >> "$log"
}
run bf_sweep_1m 1000 benchmarks/run_all.py --n 1000000 --skip-hnsw
run tenm_96 700 benchmarks/sharded_10m.py
run hnsw_sweep_200k 1400 benchmarks/run_all.py --n 200000 --skip-bf --hn-n 200000
run concurrent 900 benchmarks/concurrent_bench.py --n 200000 --dim 96 --seconds 30
run updated_100k 900 benchmarks/run_all.py --updated --updated-n 100000
echo "=== chain done $(date +%T)" >> "$log"
