#!/bin/bash
cd /root/repo
for i in 1 2; do
  echo "=== iter $i A:default"; timeout 900 python bench.py 2>&1 | grep "decode:"
  echo "=== iter $i B:fuse"; timeout 900 BENCH_FUSE=1 python bench.py 2>&1 | grep "decode:"
done
echo "=== C:fuse+mlp (once)"; timeout 900 env BENCH_MLP=fused python bench.py 2>&1 | grep -E "decode:|Error" | head -3
echo DONE
