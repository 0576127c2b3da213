#!/bin/bash
# Round-4 num_mlp_ext ablation at flagship geometry: identical data,
# seed, and schedule as flag_v21_r4.sh seed 0, with the MLP count-
# comparison heads ON (NMNConfig.num_mlp_ext — framework extension;
# the parity single-fc head measures _EqualNum 71.7% on this seed,
# exp_clevr_flag/results/flag_v21_gt_s0/00040000.tst.txt).
set -euo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
ROOT=./exp_clevr_flag
SEED=0
GT=flag_v21_gtmlp_s${SEED}
RL=flag_v21_rlmlp_s${SEED}

[ -f ${ROOT}/data/imdb/imdb_trn4k.npy ] && [ -d ${ROOT}/features ] \
    || { echo "v21 dataset missing (run flag_v21_r4.sh or flag_ext_r4.sh)"; exit 1; }

python -u exp_clevr/train_clevr_gt_layout.py --data_root ${ROOT} \
    --exp_name ${GT} --max_iter 40000 --seed ${SEED} \
    --device_data_bf16 --num_mlp_ext
echo "=== gt cloning (mlp) done $(date) ==="
for split in val tst trn4k; do
    python -u exp_clevr/eval_clevr.py --data_root ${ROOT} \
        --exp_name ${GT} --snapshot_name 00040000 --test_split $split \
        --num_mlp_ext
done
python -u exp_clevr/train_clevr_rl_gt_layout.py --data_root ${ROOT} \
    --exp_name ${RL} --max_iter 20000 --seed ${SEED} \
    --device_data_bf16 --num_mlp_ext \
    --pretrained_model ${ROOT}/tfmodel/${GT}/00040000
echo "=== rl fine-tune (mlp) done $(date) ==="
for split in val tst; do
    python -u exp_clevr/eval_clevr.py --data_root ${ROOT} \
        --exp_name ${RL} --snapshot_name 00020000 --test_split $split \
        --num_mlp_ext
done
echo "MLP-CHAIN-DONE $(date)"
