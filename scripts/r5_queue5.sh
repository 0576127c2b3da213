#!/bin/bash
# Round-5 TPU queue, stage 5 (waits for scripts/r5_queue2.sh; replaces
# the cancelled r5_queue4.sh with DEADLINE-GUARDED versions of the same
# work — round 5 ends ~03:57 UTC and the driver's bench needs the chip
# free, so every TPU launch checks the clock first):
#   9. full2 extension chain (scene_ext + scene_bounded + count_mlp_ext
#      + num_res_ext) at up to 3 seeds + select-by-val — closes ADVICE
#      r4 "num_res_ext merged but no measured results yet".
#  10. (only if still early) third from-scratch flagship seed.
set -uo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

# absolute-epoch deadlines (round end ~1787198257)
GT_DEADLINE=1787194200     # 02:50 UTC — last moment to START a GT train
RL_DEADLINE=1787195100     # 03:05 UTC — last moment to START an RL train
SELECT_DEADLINE=1787195400 # 03:10 UTC — last moment to START flag_select
SCRATCH_DEADLINE=1787192400 # 02:20 UTC — scratch s2 is ~25 min

if [ -f /tmp/r5_queue2.pid ]; then
    while kill -0 "$(cat /tmp/r5_queue2.pid)" 2>/dev/null; do
        sleep 60
    done
fi
echo "QUEUE5: stage-2 queue released the chip $(date)"

ROOT=./exp_clevr_flag
EXT="--num_res_ext --scene_ext --scene_bounded --count_mlp_ext"
for SEED in 0 1 2; do
    GT=flag_v21_gtfull2_s${SEED}
    RL=flag_v21_rlfull2_s${SEED}
    if [ ! -f ${ROOT}/tfmodel/${GT}/00040000.npz ]; then
        if [ "$(date +%s)" -ge ${GT_DEADLINE} ]; then
            echo "FULL2-GT-s${SEED} SKIPPED (deadline)"; break
        fi
        python -u exp_clevr/train_clevr_gt_layout.py --data_root ${ROOT} \
            --exp_name ${GT} --max_iter 40000 --seed ${SEED} \
            --device_data_bf16 ${EXT} || { echo "FULL2-GT-s${SEED} FAILED"; continue; }
    fi
    if [ ! -f ${ROOT}/tfmodel/${RL}/00020000.npz ]; then
        if [ "$(date +%s)" -ge ${RL_DEADLINE} ]; then
            echo "FULL2-RL-s${SEED} SKIPPED (deadline)"; break
        fi
        python -u exp_clevr/train_clevr_rl_gt_layout.py --data_root ${ROOT} \
            --exp_name ${RL} --max_iter 20000 --seed ${SEED} \
            --device_data_bf16 ${EXT} \
            --pretrained_model ${ROOT}/tfmodel/${GT}/00040000 \
            || echo "FULL2-RL-s${SEED} FAILED"
    fi
    echo "FULL2-SEED-DONE seed=${SEED} $(date)"
done

if [ "$(date +%s)" -lt ${SELECT_DEADLINE} ]; then
    # flag_select skips chains whose snapshots are absent
    python -u -m n2nmn_tpu.tools.flag_select \
        --exps flag_v21_gtfull2_s0 flag_v21_gtfull2_s1 flag_v21_gtfull2_s2 \
               flag_v21_rlfull2_s0 flag_v21_rlfull2_s1 flag_v21_rlfull2_s2 \
        --out_jsonl ${ROOT}/results/select_by_val_full2_r5.jsonl \
        --out_md ${ROOT}/results/select_by_val_full2_r5.md \
        || echo "FULL2-SELECT FAILED"
else
    echo "FULL2-SELECT SKIPPED (deadline)"
fi
echo "FULL2-DONE $(date)"

if [ "$(date +%s)" -lt ${SCRATCH_DEADLINE} ]; then
    python -u -m n2nmn_tpu.tools.scratch_flagship --seeds 2 \
        || echo "SCRATCH-S2 FAILED"
else
    echo "SCRATCH-S2 SKIPPED (deadline)"
fi
echo "R5-QUEUE5-DONE $(date)"
