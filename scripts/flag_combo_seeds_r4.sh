#!/bin/bash
# Seeds 1-2 replication of the full-extension flagship config
# (scene_ext + scene_bounded + num_mlp_ext + count_mlp_ext), same v2.1
# data and schedule as scripts/flag_v21_r4.sh seeds 1-2. Launch only
# after the seed-0 chain (scripts/combo2_r4.sh) validates the config.
set -euo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
ROOT=./exp_clevr_flag

# wait for the combo2 queue to release the chip
if [ -f /tmp/combo2_r4.pid ]; then
    while kill -0 "$(cat /tmp/combo2_r4.pid)" 2>/dev/null; do
        sleep 30
    done
fi

EXT="--num_mlp_ext --scene_ext --scene_bounded --count_mlp_ext"
for SEED in "$@"; do
    GT=flag_v21_gtfull_s${SEED}
    RL=flag_v21_rlfull_s${SEED}
    python -u exp_clevr/train_clevr_gt_layout.py --data_root ${ROOT} \
        --exp_name ${GT} --max_iter 40000 --seed ${SEED} \
        --device_data_bf16 ${EXT}
    for split in val tst; do
        python -u exp_clevr/eval_clevr.py --data_root ${ROOT} \
            --exp_name ${GT} --snapshot_name 00040000 \
            --test_split $split ${EXT}
    done
    python -u exp_clevr/train_clevr_rl_gt_layout.py --data_root ${ROOT} \
        --exp_name ${RL} --max_iter 20000 --seed ${SEED} \
        --device_data_bf16 ${EXT} \
        --pretrained_model ${ROOT}/tfmodel/${GT}/00040000
    for split in val tst; do
        python -u exp_clevr/eval_clevr.py --data_root ${ROOT} \
            --exp_name ${RL} --snapshot_name 00020000 \
            --test_split $split ${EXT}
    done
    echo "FULL-SEED-DONE seed=${SEED} $(date)"
done
echo "FULL-SEEDS-DONE $(date)"
