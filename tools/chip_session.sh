#!/bin/bash
# One-shot on-chip validation + bench session. The axon tunnel allows one
# process at a time and punishes mid-flight kills (CLAUDE.md), so run the
# whole kernel-gate -> bench -> artifact sequence back-to-back in one
# launch with NO timeout wrappers: each python attempt surfaces
# UNAVAILABLE on its own (~25 min) if the relay is down.
#
# Usage: bash tools/chip_session.sh   (logs under /tmp/cs_*.log)
set -u
cd "$(dirname "$0")/.."

echo "=== preflight ($(date -u +%H:%M:%S)) ==="
python tools/preflight.py 2>&1 | tee /tmp/cs_preflight.log
rc=${PIPESTATUS[0]}
echo "preflight rc=$rc"
if [ "$rc" -ne 0 ]; then
    echo "preflight FAILED - not running benches (commit gate: do not"
    echo "commit kernel-knob changes until this passes on chip)"
    exit 1
fi

echo "=== bench ($(date -u +%H:%M:%S)) ==="
python bench.py >/tmp/cs_bench.json 2>/tmp/cs_bench.log
echo "bench rc=$?"
cat /tmp/cs_bench.json

echo "=== train bench G=128 ($(date -u +%H:%M:%S)) ==="
python tools/bench_train.py 2>&1 | tee /tmp/cs_train.log
echo "train-bench rc=$?"

echo "=== train bench G=256 lean ($(date -u +%H:%M:%S)) ==="
python tools/bench_train.py --depth 7 --lean --key g256_lean \
    --steps 10 --warmup 2 2>&1 | tee /tmp/cs_train256.log
echo "train-bench-g256 rc=$?"

echo "=== viewer latency ($(date -u +%H:%M:%S)) ==="
python tools/bench_viewer.py 2>&1 | tee /tmp/cs_viewer.log
echo "viewer-bench rc=$?"

echo "=== scaling 1-chip anchor ($(date -u +%H:%M:%S)) ==="
python tools/bench_scaling.py --tpu 2>&1 | tee /tmp/cs_scaling.log
echo "scaling rc=$?"

echo "=== train demo (convergence artifact) ($(date -u +%H:%M:%S)) ==="
python examples/train_slab_demo.py --out /tmp/slab_demo --bank \
    2>&1 | tee /tmp/cs_demo.log
echo "train-demo rc=$?"
echo "=== done ($(date -u +%H:%M:%S)) ==="
