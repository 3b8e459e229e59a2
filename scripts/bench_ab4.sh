#!/bin/bash
cd /root/repo
for i in 1 2 3; do
  echo "=== iter $i A:bn2048(default)"; timeout 850 python bench.py 2>&1 | grep "decode:"
  echo "=== iter $i B:bn4096"; timeout 850 env GPTQ_TPU_BN=4096 python bench.py 2>&1 | grep "decode:"
done
echo DONE
