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
run bf_sweep_1m 2400 benchmarks/run_all.py --n 1000000 --skip-hnsw
run hnsw_sweep_200k 2400 benchmarks/run_all.py --n 200000 --skip-bf --hn-n 200000
run updated_100k 1800 benchmarks/run_all.py --updated --updated-n 100000
run concurrent 1500 benchmarks/concurrent_bench.py --n 200000 --dim 96 --seconds 30
run tenm_96 2400 benchmarks/sharded_10m.py --queries 1024
echo "=== chain done $(date +%T)" >> "$log"
