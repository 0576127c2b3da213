#!/bin/bash
# Round-4 post-combo TPU queue: validate bench.py's new pipelined
# headline, then serving-mode bench on the combined-extension snapshot.
# Waits for flag_combo_r4.sh to release the TPU (single-holder rule).
set -euo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

if [ -f /tmp/flag_combo_r4.pid ]; then
    while kill -0 "$(cat /tmp/flag_combo_r4.pid)" 2>/dev/null; do
        sleep 30
    done
fi
if ! grep -q "COMBO-CHAIN-DONE" /tmp/flag_combo_r4.log; then
    echo "ERROR: combo chain did not complete cleanly" >&2
    exit 1
fi

echo "=== bench.py validation $(date) ==="
python bench.py | tee /tmp/bench_r4_validate.json

echo "=== trained serving on combo RL snapshot $(date) ==="
python -m n2nmn_tpu.tools.trained_serving_bench \
    --data_root ./exp_clevr_flag --exp_name flag_v21_rlcombo_s0 \
    --snapshot_name 00020000 --batch_sizes 256 1024 \
    --scene_ext --num_mlp_ext --count_mlp_ext \
    --out perf/trained_serving_flag_v21_rlcombo_r4.json

echo "POST-COMBO-DONE $(date)"
