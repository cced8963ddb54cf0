#!/bin/bash
# Round-5 chain 4: sweep + concurrent reruns on the post-fix tree
# (deferred swap-deletes, tiered_migrate_batch, warm-ladder methodology,
# data-driven radii).
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
run hnsw_sweep_200k 3000 benchmarks/run_all.py --n 200000 --hn-n 200000 --skip-bf
run concurrent 1800 benchmarks/concurrent_bench.py
run headline_bf16 1200 bench.py --dtype bf16
run headline_int8 1200 bench.py --dtype int8
echo "=== chain4 done $(date +%T)" >> "$log"
