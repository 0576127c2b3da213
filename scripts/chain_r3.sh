#!/bin/bash
# One-shot round-3 chain: wait for the replicate job (pid $1) to release
# the TPU, then drive the verify-recipe smoke surfaces, then the perf
# session. Never kills anything.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

while kill -0 "$1" 2>/dev/null; do sleep 20; done
echo "=== replicate done, TPU free: $(date) ==="

# verify-recipe smoke (SKILL.md surfaces 1-2): SHAPES train + eval CLIs
python exp_shapes/train_shapes_gt_layout.py --max_iter 25 \
    --exp_name smoke_r3 && \
python exp_shapes/eval_shapes.py --exp_name smoke_r3 \
    --snapshot_name 00000025 --test_split val
echo "=== verify smoke rc=$? ==="

bash scripts/perf_session_r3.sh
echo "=== perf session done: $(date) ==="
