#!/bin/bash
# Round-5 TPU queue, stage 4 (waits for scripts/r5_queue3.sh):
#   9. full2 extension chain at 3 seeds: scene_ext + scene_bounded +
#      count_mlp_ext + num_res_ext (residual comparison heads in place
#      of the pure-MLP num_mlp_ext, which traded _LessNum/_MoreNum down
#      to 66-71% in the full config — ADVICE r4: "merged but no
#      measured results yet"). Same v2.1 data/schedule as the full
#      chains; select-by-val + layout dumps at the end.
set -uo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

if [ -f /tmp/r5_queue3.pid ]; then
    while kill -0 "$(cat /tmp/r5_queue3.pid)" 2>/dev/null; do
        sleep 60
    done
fi
echo "QUEUE4: stage-3 queue released the chip $(date)"

ROOT=./exp_clevr_flag
EXT="--num_res_ext --scene_ext --scene_bounded --count_mlp_ext"
for SEED in 0 1 2; do
    GT=flag_v21_gtfull2_s${SEED}
    RL=flag_v21_rlfull2_s${SEED}
    if [ ! -f ${ROOT}/tfmodel/${GT}/00040000.npz ]; then
        python -u exp_clevr/train_clevr_gt_layout.py --data_root ${ROOT} \
            --exp_name ${GT} --max_iter 40000 --seed ${SEED} \
            --device_data_bf16 ${EXT} || { echo "FULL2-GT-s${SEED} FAILED"; continue; }
    fi
    if [ ! -f ${ROOT}/tfmodel/${RL}/00020000.npz ]; then
        python -u exp_clevr/train_clevr_rl_gt_layout.py --data_root ${ROOT} \
            --exp_name ${RL} --max_iter 20000 --seed ${SEED} \
            --device_data_bf16 ${EXT} \
            --pretrained_model ${ROOT}/tfmodel/${GT}/00040000 \
            || echo "FULL2-RL-s${SEED} FAILED"
    fi
    echo "FULL2-SEED-DONE seed=${SEED} $(date)"
done

python -u -m n2nmn_tpu.tools.flag_select \
    --exps flag_v21_gtfull2_s0 flag_v21_gtfull2_s1 flag_v21_gtfull2_s2 \
           flag_v21_rlfull2_s0 flag_v21_rlfull2_s1 flag_v21_rlfull2_s2 \
    --out_jsonl ${ROOT}/results/select_by_val_full2_r5.jsonl \
    --out_md ${ROOT}/results/select_by_val_full2_r5.md \
    || echo "FULL2-SELECT FAILED"
echo "R5-QUEUE4-DONE $(date)"
