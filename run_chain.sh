#!/bin/bash
# Sequential TPU bench chain: warm NIZK 16, warm pst, SNARK 2^20.
set -x
while pgrep -f "python benches/testudo.py --nizk" > /dev/null; do sleep 20; done
echo "=== nizk 16 WARM $(date) ==="
TESTUDO_PROFILE=1 timeout 2400 python benches/testudo.py --nizk 16
echo "EXIT=$?"
echo "=== pst 10 14 WARM $(date) ==="
TESTUDO_BENCH_WARM=1 timeout 3600 python benches/pst.py 10 14
echo "EXIT=$?"
echo "=== snark 20 $(date) ==="
TESTUDO_PROFILE=1 TESTUDO_FUSED_SUMCHECK=0 timeout 6600 python benches/testudo.py 20
echo "EXIT=$?"
echo "=== done $(date) ==="
