#!/bin/bash
# Round-5 chain 6: 10M x 96 HNSW build (jitted generator, held-out
# queries via latent_key) + delete-path micro-bench.
cd /root/repo
mkdir -p bench_out
log=bench_out/chain.log
run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date +%T)" >> "$log"
  timeout "$tmo" python "$@" > "bench_out/$name.jsonl" 2> "bench_out/$name.err"
  echo "=== $name exit=$? $(date +%T)" >> "$log"
}
run delete_bench 1800 benchmarks/delete_bench.py --n 100000
run hnsw_10m_96 13500 benchmarks/hnsw_build_bench.py --n 10000000 --dim 96 \
    --m 16 --efc 200 --scan-batches 8 --queries 128 --efs 10,50,100,200,500
echo "=== chain6 done $(date +%T)" >> "$log"
