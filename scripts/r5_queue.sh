#!/bin/bash
# Round-5 TPU queue (single chip — strictly serial):
#   1. wait for the running select-by-val sweep (tools/flag_select)
#   2. trained-serving composition bench on the full-extension snapshots
#      (VERDICT r4 #4: {fused, early-exit, pipelined, both})
#   3. VQA flagship 3-seed cloning->RL at real 14x14x2048 geometry (#2)
#   4. from-scratch REINFORCE at flagship geometry, 2 seeds (#3)
# Each stage is idempotent; stages echo *-DONE markers for the monitor.
set -uo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

if [ -f /tmp/flag_select_r5.pid ]; then
    while kill -0 "$(cat /tmp/flag_select_r5.pid)" 2>/dev/null; do
        sleep 30
    done
fi
echo "QUEUE: sweep released the chip $(date)"

EXT="--scene_ext --scene_bounded --num_mlp_ext --count_mlp_ext"
python -u -m n2nmn_tpu.tools.trained_serving_bench \
    --data_root ./exp_clevr_flag --exp_name flag_v21_gtfull_s0 \
    --snapshot_name 00040000 ${EXT} --batch_sizes 256 1024 \
    --out perf/trained_serving_compose_gtfull_r5.json \
    || echo "SERVING-BENCH-GT FAILED"
python -u -m n2nmn_tpu.tools.trained_serving_bench \
    --data_root ./exp_clevr_flag --exp_name flag_v21_rlfull_s0 \
    --snapshot_name 00020000 ${EXT} --batch_sizes 256 1024 \
    --out perf/trained_serving_compose_rlfull_r5.json \
    || echo "SERVING-BENCH-RL FAILED"
echo "SERVING-BENCH-DONE $(date)"

python -u -m n2nmn_tpu.tools.vqa_flagship --seeds 0 1 2 \
    || echo "VQA-FLAG FAILED"

python -u -m n2nmn_tpu.tools.scratch_flagship --seeds 0 1 \
    || echo "SCRATCH FAILED"

echo "R5-QUEUE-DONE $(date)"
