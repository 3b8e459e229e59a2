#!/bin/bash
# Sequential A/B sweep — one TPU client at a time
cd /root/repo
for cfg in "BENCH_FUSE=1" "BENCH_KV=int4" "GPTQ_TPU_RT_GROUPS=32" "GPTQ_TPU_BN=2048" "BENCH_FUSE=1 BENCH_KV=int4"; do
  echo "=== $cfg"
  env $cfg python bench.py 2>&1 | tail -2
done
