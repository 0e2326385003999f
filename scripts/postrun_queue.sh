#!/usr/bin/env bash
# Sequential TPU measurement queue for the end of a round: run after any
# long training run has released the chip. Each step is timeout-guarded and
# logs to /tmp so a crash in one does not lose the others.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== quick test tier (gate: one test per subsystem, ~90 s) ==="
JAX_PLATFORMS=cpu timeout 600 python -m pytest tests/ -m quick -q 2>&1 | tail -3

echo "=== bench_lattice (rff vs exact lattice on the train path) ==="
timeout 1800 python scripts/bench_lattice.py 2>/tmp/bench_lattice.err | tee /tmp/bench_lattice.json

echo "=== bench_scales (3/2/1-scale teacher TTA) ==="
timeout 2400 python scripts/bench_scales.py 2>/tmp/bench_scales.err | tee /tmp/bench_scales.json

echo "=== bench.py (headline VOC + COCO lines) ==="
timeout 2400 python bench.py 2>/tmp/bench_r3.err | tee /tmp/bench_r3.json

echo "=== TPU-gated kernel parity tests ==="
COSA_TEST_PLATFORM=axon timeout 1800 python -m pytest tests/test_tpu_kernels.py -q 2>&1 | tee /tmp/tpu_tests.log | tail -5

echo "=== queue done ==="
