#!/bin/bash
# Round-4 TPU queue after the scene+num_mlp chain: validate bench.py's
# pipelined headline, then the full-extension candidate config at
# flagship geometry, seed 0:
#   --scene_ext --scene_bounded --num_mlp_ext --count_mlp_ext
# Motivation: raw (unbounded) scene_ext logits shift the count-feature
# value regime and collapse every count head that also reads _Find maps
# (flag_v21_gtcombo_s0 = scene+num_mlp: _Find _Count 60%, _Or _Count
# 32%, _MoreNum 66% — all >=90% without scene_ext); scene_bounded
# squashes objectness to [0, pos_val], count_mlp_ext adds the hidden
# layer the two-family Count head needs.
set -euo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
ROOT=./exp_clevr_flag

echo "=== bench.py validation $(date) ==="
python bench.py | tee /tmp/bench_r4_validate.json

EXT="--num_mlp_ext --scene_ext --scene_bounded --count_mlp_ext"
GT=flag_v21_gtfull_s0
RL=flag_v21_rlfull_s0
python -u exp_clevr/train_clevr_gt_layout.py --data_root ${ROOT} \
    --exp_name ${GT} --max_iter 40000 --seed 0 --device_data_bf16 ${EXT}
echo "=== gt cloning (full) done $(date) ==="
for split in val tst trn4k; do
    python -u exp_clevr/eval_clevr.py --data_root ${ROOT} \
        --exp_name ${GT} --snapshot_name 00040000 --test_split $split ${EXT}
done
python -u exp_clevr/train_clevr_rl_gt_layout.py --data_root ${ROOT} \
    --exp_name ${RL} --max_iter 20000 --seed 0 --device_data_bf16 ${EXT} \
    --pretrained_model ${ROOT}/tfmodel/${GT}/00040000
echo "=== rl fine-tune (full) done $(date) ==="
for split in val tst; do
    python -u exp_clevr/eval_clevr.py --data_root ${ROOT} \
        --exp_name ${RL} --snapshot_name 00020000 --test_split $split ${EXT}
done
echo "FULL-CHAIN-DONE $(date)"
