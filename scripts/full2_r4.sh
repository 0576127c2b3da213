#!/bin/bash
# full2: the residual-head full-extension flagship candidate
# (scene_ext + scene_bounded + num_res_ext + count_mlp_ext) at seed 0,
# same v2.1 data / schedule as scripts/combo2_r4.sh. num_res_ext
# replaces num_mlp_ext: the pure-MLP comparison heads traded families
# (EqualNum 100% but Less/More 96-100% -> 67-71% vs parity in the
# flag_v21_*full_s0 run); the residual form keeps the parity linear
# path (exact at init) and adds a zero-init MLP correction.
# Sequential by design — only ONE process may hold the TPU.
set -euo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
ROOT=./exp_clevr_flag

# wait for the seeds chain to release the chip
if [ -f /tmp/full_seeds_r4.pid ]; then
    while kill -0 "$(cat /tmp/full_seeds_r4.pid)" 2>/dev/null; do
        sleep 30
    done
fi
# gate on its real outputs, not PID liveness (advisor finding)
if [ ! -f ${ROOT}/results/flag_v21_rlfull_s2/00020000.tst.txt ]; then
    echo "WARNING: seeds chain outputs missing; proceeding anyway" >&2
fi

EXT="--num_res_ext --scene_ext --scene_bounded --count_mlp_ext"
SEED=0
GT=flag_v21_gtfull2_s${SEED}
RL=flag_v21_rlfull2_s${SEED}
python -u exp_clevr/train_clevr_gt_layout.py --data_root ${ROOT} \
    --exp_name ${GT} --max_iter 40000 --seed ${SEED} \
    --device_data_bf16 ${EXT}
echo "=== gt cloning (full2) done $(date) ==="
for split in val tst; do
    python -u exp_clevr/eval_clevr.py --data_root ${ROOT} \
        --exp_name ${GT} --snapshot_name 00040000 \
        --test_split $split ${EXT}
done
python -u exp_clevr/train_clevr_rl_gt_layout.py --data_root ${ROOT} \
    --exp_name ${RL} --max_iter 20000 --seed ${SEED} \
    --device_data_bf16 ${EXT} \
    --pretrained_model ${ROOT}/tfmodel/${GT}/00040000
echo "=== rl fine-tune (full2) done $(date) ==="
for split in val tst; do
    python -u exp_clevr/eval_clevr.py --data_root ${ROOT} \
        --exp_name ${RL} --snapshot_name 00020000 \
        --test_split $split ${EXT}
done
echo "FULL2-CHAIN-DONE $(date)"
