#!/bin/bash
# Round-5 chain 8: 5M x 96 HNSW (10M's links0 pads 4x to the 128-lane
# tile — 8.5 GB for ANY M<=32 — plus an XLA remat copy of the data array;
# see bench_out/hnsw_10m_96.err for the allocation table).
cd /root/repo
mkdir -p bench_out
log=bench_out/chain.log
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date +%T)" >> "$log"
  timeout "$tmo" python "$@" > "bench_out/$name.jsonl" 2> "bench_out/$name.err"
  echo "=== $name exit=$? $(date +%T)" >> "$log"
}
run hnsw_5m_96 12000 benchmarks/hnsw_build_bench.py --n 5000000 --dim 96 \
    --m 16 --efc 200 --batch 512 --scan-batches 8 --queries 128 \
    --efs 10,50,100,200,500 --no-nav --donate-state
echo "=== chain8 done $(date +%T)" >> "$log"
