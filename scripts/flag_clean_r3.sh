#!/bin/bash
# Round-3 flagship retrain on the FIXED renderer (semantic channels clean
# off-object — commit 99ac2261): gt cloning -> eval + per-family
# breakdown -> RL fine-tune -> eval -> trained-snapshot serving bench.
# Sequential by design — only ONE process may hold the TPU.
# set -eo pipefail so a failed stage aborts the chain instead of running
# eval/RL/serving against a missing or stale snapshot (advisor finding).
set -xeo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

# wait for the dataset regeneration (mini_clevr --flagship) if running;
# gate on the generator's real output files, not PID liveness (a reused
# PID stalls forever; a stale pidfile with a dead PID proves nothing)
if [ -f /tmp/flaggen.pid ]; then
    while kill -0 "$(cat /tmp/flaggen.pid)" 2>/dev/null; do sleep 10; done
fi
if [ ! -f ./exp_clevr_flag/data/imdb/imdb_trn.npy ] \
        || [ ! -d ./exp_clevr_flag/features ]; then
    echo "ERROR: flagship dataset missing after generator exit" >&2
    exit 1
fi
echo "=== dataset ready: $(date) ==="

python -u exp_clevr/train_clevr_gt_layout.py --data_root ./exp_clevr_flag \
    --exp_name flag_gt_clean --max_iter 40000 --device_data
echo "=== gt cloning done? $(date) ==="

for split in val tst; do
    python -u exp_clevr/eval_clevr.py --data_root ./exp_clevr_flag \
        --exp_name flag_gt_clean --snapshot_name 00040000 \
        --test_split $split
done
python -u -m n2nmn_tpu.tools.eval_breakdown --data_root ./exp_clevr_flag \
    --exp_name flag_gt_clean --snapshot_name 00040000 --split tst \
    | tee exp_clevr_flag/results/flag_gt_clean/breakdown_tst.txt
echo "=== gt eval done? $(date) ==="

python -u exp_clevr/train_clevr_rl_gt_layout.py --data_root ./exp_clevr_flag \
    --exp_name flag_rl_clean --max_iter 20000 --device_data \
    --pretrained_model ./exp_clevr_flag/tfmodel/flag_gt_clean/00040000
echo "=== rl fine-tune done? $(date) ==="

for split in val tst; do
    python -u exp_clevr/eval_clevr.py --data_root ./exp_clevr_flag \
        --exp_name flag_rl_clean --snapshot_name 00020000 \
        --test_split $split
done
python -u -m n2nmn_tpu.tools.eval_breakdown --data_root ./exp_clevr_flag \
    --exp_name flag_rl_clean --snapshot_name 00020000 --split tst \
    | tee exp_clevr_flag/results/flag_rl_clean/breakdown_tst.txt
echo "=== rl eval done? $(date) ==="

python -u -m n2nmn_tpu.tools.trained_serving_bench \
    --data_root ./exp_clevr_flag --exp_name flag_gt_clean \
    --snapshot_name 00040000 --batch_sizes 256 1024 \
    --out perf/trained_serving_flag_clean_r3.json
echo "CHAIN-DONE? $(date)"
