#!/bin/bash
# Round-4 relay-gated evidence capture, in priority order. Each step writes
# its own log under /tmp/r04/ and failures do not stop later steps.
# Run when the axon relay answers: bash experiments/relay_return.sh
set -u
mkdir -p /tmp/r04
cd /root/repo

echo "== 0. probe"
timeout 120 python experiments/probe_tpu.py > /tmp/r04/probe.log 2>&1
echo "probe rc=$? (0 = relay up)"

echo "== 1. bench.py (headline + all sections; ~15 min cold)"
timeout 3000 python bench.py > /tmp/r04/bench_stdout.json 2> /tmp/r04/bench_stderr.log
echo "bench rc=$?"

echo "== 2. MFU-gap experiment (verdict #4)"
timeout 2400 python experiments/mfu_gap.py > /tmp/r04/mfu_gap.log 2>&1
echo "mfu rc=$?"

echo "== 3. int8 gradient-norm stability trace (verdict #5)"
timeout 2400 python experiments/bf16_divergence.py --steps 400 \
  --arms kernel-eps,int8 --skip-micro \
  --out docs/int8_stability_r04.json > /tmp/r04/stability.log 2>&1
echo "stability rc=$?"

echo "== 4. on-chip suite (verdict #8; ~30-60 min)"
QATTN_TEST_TPU=1 timeout 5400 python -m pytest tests/ -q \
  > /tmp/r04/tpu_suite.log 2>&1
echo "suite rc=$?"

echo "== done; logs in /tmp/r04/"
