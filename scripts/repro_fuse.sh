#!/bin/bash
cd /root/repo
echo "=== BENCH_FUSE=1 full output"
timeout 850 env BENCH_FUSE=1 python bench.py 2>&1 | tail -20
echo "exit: $?"
