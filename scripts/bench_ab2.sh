#!/bin/bash
cd /root/repo
for i in 1 2 3; do
  echo "=== iter $i A:default"; python bench.py 2>&1 | grep "decode:"
  echo "=== iter $i B:fuse"; BENCH_FUSE=1 python bench.py 2>&1 | grep "decode:"
  echo "=== iter $i C:fuse+mlp"; BENCH_MLP=fused python bench.py 2>&1 | grep "decode:"
done
