#!/bin/bash
# Round-5 chain 5: concurrent rerun (flat-bucket warmup), mini HNSW sweep
# (bulk-delete path), then the 10M x 96 HNSW build — the long pole last.
cd /root/repo
mkdir -p bench_out
log=bench_out/chain.log
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date +%T)" >> "$log"
  timeout "$tmo" python "$@" > "bench_out/$name.jsonl" 2> "bench_out/$name.err"
  echo "=== $name exit=$? $(date +%T)" >> "$log"
}
run concurrent 2400 benchmarks/concurrent_bench.py --seconds 60
run hnsw_mini_100k 1800 benchmarks/run_all.py --n 100000 --hn-n 100000 --skip-bf
run hnsw_10m_96 12000 benchmarks/hnsw_build_bench.py --n 10000000 --dim 96 \
    --m 16 --efc 200 --scan-batches 8 --queries 128 --efs 10,50,100,200,500
echo "=== chain5 done $(date +%T)" >> "$log"
