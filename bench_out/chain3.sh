#!/bin/bash
# Round-5 chain 3: headline with fused fallback, fixed 10M, updated rerun.
cd /root/repo
mkdir -p bench_out
log=bench_out/chain.log
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date +%T)" >> "$log"
  timeout "$tmo" python "$@" > "bench_out/$name.jsonl" 2> "bench_out/$name.err"
  echo "=== $name exit=$? $(date +%T)" >> "$log"
}
run headline_fused 1800 bench.py
run tenm_96 2400 benchmarks/sharded_10m.py --queries 1024
run updated_100k 2400 benchmarks/run_all.py --updated --updated-n 100000
echo "=== chain3 done $(date +%T)" >> "$log"
