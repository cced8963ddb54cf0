#!/bin/bash
# Round-5 chain 7: 10M x 96 HNSW with the HBM headroom flags
# (state donation, no nav shadow, batch 512).
cd /root/repo
mkdir -p bench_out
log=bench_out/chain.log
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date +%T)" >> "$log"
  timeout "$tmo" python "$@" > "bench_out/$name.jsonl" 2> "bench_out/$name.err"
  echo "=== $name exit=$? $(date +%T)" >> "$log"
}
run hnsw_10m_96 14400 benchmarks/hnsw_build_bench.py --n 10000000 --dim 96 \
    --m 16 --efc 200 --batch 512 --scan-batches 8 --queries 128 \
    --efs 10,50,100,200,500 --no-nav --donate-state
echo "=== chain7 done $(date +%T)" >> "$log"
