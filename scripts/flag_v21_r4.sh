#!/bin/bash
# Round-4 flagship chain, renderer v2.1 (deterministic backbone-like
# channels, NO per-image noise; 80k questions / 20k scenes — closer to
# real CLEVR's 70k-scene scale; see mini_clevr.py renderer notes):
# regenerate data once, then per seed: gt cloning -> eval (val/tst +
# trn4k memorization probe) -> RL fine-tune -> eval.
# Usage: flag_v21_r4.sh <seed> [<seed> ...]
set -euo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
ROOT=./exp_clevr_flag
MARKER=${ROOT}/data/.v21_80k

# gate on the real generated files too: a fresh container checkout can
# carry a stale tracked marker while the gitignored data is gone
if [ ! -f ${MARKER} ] || [ ! -f ${ROOT}/data/imdb/imdb_trn4k.npy ] \
   || [ ! -d ${ROOT}/features ]; then
    rm -rf ${ROOT}/features ${ROOT}/data/imdb
    python -u -m n2nmn_tpu.data.builders.mini_clevr --out_root ${ROOT} \
        --flagship --num_train 80000 --seed 0
    python -c "
import numpy as np
imdb = np.load('${ROOT}/data/imdb/imdb_trn.npy', allow_pickle=True)
np.save('${ROOT}/data/imdb/imdb_trn4k.npy', imdb[:4000])
"
    touch ${MARKER}
fi
echo "=== dataset ready: $(date) ==="

for SEED in "$@"; do
    GT=flag_v21_gt_s${SEED}
    RL=flag_v21_rl_s${SEED}
    python -u exp_clevr/train_clevr_gt_layout.py --data_root ${ROOT} \
        --exp_name ${GT} --max_iter 40000 --seed ${SEED} \
        --device_data_bf16
    echo "=== gt cloning s${SEED} done $(date) ==="
    for split in val tst trn4k; do
        python -u exp_clevr/eval_clevr.py --data_root ${ROOT} \
            --exp_name ${GT} --snapshot_name 00040000 --test_split $split
    done
    python -u exp_clevr/train_clevr_rl_gt_layout.py --data_root ${ROOT} \
        --exp_name ${RL} --max_iter 20000 --seed ${SEED} \
        --device_data_bf16 \
        --pretrained_model ${ROOT}/tfmodel/${GT}/00040000
    echo "=== rl fine-tune s${SEED} done $(date) ==="
    for split in val tst; do
        python -u exp_clevr/eval_clevr.py --data_root ${ROOT} \
            --exp_name ${RL} --snapshot_name 00020000 --test_split $split
    done
    echo "SEED-DONE seed=${SEED} $(date)"
done
echo "CHAIN-DONE $(date)"
