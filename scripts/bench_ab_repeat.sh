#!/bin/bash
cd /root/repo
for i in 1 2 3; do
  echo "=== iter $i default"; python bench.py 2>&1 | grep "decode:"
  echo "=== iter $i BN=2048"; GPTQ_TPU_BN=2048 python bench.py 2>&1 | grep "decode:"
done
