#!/bin/bash
# Round-5 chain 9: the reference's updated-index config at its full 500k
# scale (BASELINE.md row: 500k fp32, memory + TopK before/after full
# overwrite).
cd /root/repo
mkdir -p bench_out
log=bench_out/chain.log
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date +%T)" >> "$log"
  timeout "$tmo" python "$@" > "bench_out/$name.jsonl" 2> "bench_out/$name.err"
  echo "=== $name exit=$? $(date +%T)" >> "$log"
}
run updated_500k 10800 benchmarks/run_all.py --updated --updated-n 500000
echo "=== chain9 done $(date +%T)" >> "$log"
