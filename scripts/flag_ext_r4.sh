#!/bin/bash
# Round-4 module-extension ablations at flagship geometry, seed 0:
# identical data/seed/schedule as flag_v21_r4.sh seed 0 (baselines:
# exp_clevr_flag/results/flag_v21_{gt,rl}_s0), with
#   chain 1: --num_mlp_ext  (MLP count-comparison heads; parity single-fc
#            head measures _EqualNum 71.7% on this seed)
#   chain 2: --scene_ext    (learned objectness _Scene attention; parity
#            constant-attention Scene floors _Scene _Count at ~19%)
# Data gate checks the REAL generated files, not just a marker — a fresh
# container checkout can carry a stale marker without the gitignored data.
set -euo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
ROOT=./exp_clevr_flag

if [ ! -f ${ROOT}/data/imdb/imdb_trn4k.npy ] || [ ! -d ${ROOT}/features ]; then
    echo "=== regenerating v2.1 flagship dataset $(date) ==="
    rm -rf ${ROOT}/features ${ROOT}/data/imdb
    python -u -m n2nmn_tpu.data.builders.mini_clevr --out_root ${ROOT} \
        --flagship --num_train 80000 --seed 0
    python -c "
import numpy as np
imdb = np.load('${ROOT}/data/imdb/imdb_trn.npy', allow_pickle=True)
np.save('${ROOT}/data/imdb/imdb_trn4k.npy', imdb[:4000])
"
fi
echo "=== dataset ready: $(date) ==="

run_chain () {
    local TAG=$1; shift
    local GT=flag_v21_gt${TAG}_s0
    local RL=flag_v21_rl${TAG}_s0
    python -u exp_clevr/train_clevr_gt_layout.py --data_root ${ROOT} \
        --exp_name ${GT} --max_iter 40000 --seed 0 \
        --device_data_bf16 "$@"
    echo "=== gt cloning (${TAG}) done $(date) ==="
    for split in val tst trn4k; do
        python -u exp_clevr/eval_clevr.py --data_root ${ROOT} \
            --exp_name ${GT} --snapshot_name 00040000 --test_split $split \
            "$@"
    done
    python -u exp_clevr/train_clevr_rl_gt_layout.py --data_root ${ROOT} \
        --exp_name ${RL} --max_iter 20000 --seed 0 \
        --device_data_bf16 "$@" \
        --pretrained_model ${ROOT}/tfmodel/${GT}/00040000
    echo "=== rl fine-tune (${TAG}) done $(date) ==="
    for split in val tst; do
        python -u exp_clevr/eval_clevr.py --data_root ${ROOT} \
            --exp_name ${RL} --snapshot_name 00020000 --test_split $split \
            "$@"
    done
    echo "CHAIN-DONE tag=${TAG} $(date)"
}

run_chain mlp --num_mlp_ext
run_chain scene --scene_ext
echo "EXT-CHAINS-DONE $(date)"
