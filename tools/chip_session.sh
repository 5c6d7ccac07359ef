#!/bin/bash
# One-shot on-chip validation + bench session. The axon tunnel allows one
# process at a time and punishes mid-flight kills (CLAUDE.md), so run the
# whole kernel-gate -> bench -> train-bench sequence back-to-back in one
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

echo "=== train bench ($(date -u +%H:%M:%S)) ==="
python tools/bench_train.py 2>&1 | tee /tmp/cs_train.log
echo "train-bench rc=$?"
echo "=== done ($(date -u +%H:%M:%S)) ==="
