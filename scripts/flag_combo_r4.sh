#!/bin/bash
# Round-4 combined-extension chain at flagship geometry, seed 0:
# --scene_ext + --num_mlp_ext + --count_mlp_ext on the same v2.1 data /
# seed / schedule as the single-extension ablations. Motivation (seed-0
# measurements, exp_clevr_flag/results):
#   flag_v21_gt_s0        83.7% tst  (_Scene _Count 19%, _EqualNum 72%)
#   flag_v21_gtmlp_s0     83.4% tst  (_Or _Count 97%, _Scene _Count 19%)
#   flag_v21_gtscene_s0   80.0% tst  (_Scene _Count 100%, but the shared
#                         linear Count head collapses on _Find maps:
#                         _Find _Count 60%, _Or _Count 31%)
# count_mlp_ext gives Count a hidden layer so it can serve both
# attention families; the combo targets the union of the family wins.
set -euo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
ROOT=./exp_clevr_flag

# wait for the in-flight ext chain to release the TPU (completion
# marker = its final echo in the log, not PID liveness)
if [ -f /tmp/flag_ext_r4.pid ]; then
    while kill -0 "$(cat /tmp/flag_ext_r4.pid)" 2>/dev/null; do
        sleep 30
    done
fi

if [ ! -f ${ROOT}/data/imdb/imdb_trn4k.npy ] || [ ! -d ${ROOT}/features ]; then
    echo "ERROR: v2.1 flagship dataset missing; run flag_ext_r4.sh first" >&2
    exit 1
fi

EXT="--num_mlp_ext --scene_ext --count_mlp_ext"
GT=flag_v21_gtcombo_s0
RL=flag_v21_rlcombo_s0
python -u exp_clevr/train_clevr_gt_layout.py --data_root ${ROOT} \
    --exp_name ${GT} --max_iter 40000 --seed 0 --device_data_bf16 ${EXT}
echo "=== gt cloning (combo) done $(date) ==="
for split in val tst trn4k; do
    python -u exp_clevr/eval_clevr.py --data_root ${ROOT} \
        --exp_name ${GT} --snapshot_name 00040000 --test_split $split ${EXT}
done
python -u exp_clevr/train_clevr_rl_gt_layout.py --data_root ${ROOT} \
    --exp_name ${RL} --max_iter 20000 --seed 0 --device_data_bf16 ${EXT} \
    --pretrained_model ${ROOT}/tfmodel/${GT}/00040000
echo "=== rl fine-tune (combo) done $(date) ==="
for split in val tst; do
    python -u exp_clevr/eval_clevr.py --data_root ${ROOT} \
        --exp_name ${RL} --snapshot_name 00020000 --test_split $split ${EXT}
done
echo "COMBO-CHAIN-DONE $(date)"
