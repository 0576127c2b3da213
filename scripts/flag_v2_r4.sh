#!/bin/bash
# Round-4 flagship chain on the v2 renderer (backbone-like projected
# channels + scenes shared across 4 questions — the fix for the round-3
# noise-fingerprint memorization, see mini_clevr.py renderer note):
# gt cloning -> eval (val/tst + trn4k memorization probe) -> RL
# fine-tune -> eval. Sequential by design — only ONE process may hold
# the TPU. Usage: flag_v2_r4.sh <seed>
set -euo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
SEED=${1:-0}
GT=flag_v2_gt_s${SEED}
RL=flag_v2_rl_s${SEED}
ROOT=./exp_clevr_flag

# gate on the generator's last-written file (completion marker), not PID
# liveness (ADVICE r3: stale/reused PIDs stall or false-start the chain)
while [ ! -f ${ROOT}/data/vocabulary_layout.txt ]; do sleep 10; done
echo "=== dataset ready: $(date) ==="

# refresh the 4k train-subset imdb used as the memorization probe
python -c "
import numpy as np
imdb = np.load('${ROOT}/data/imdb/imdb_trn.npy', allow_pickle=True)
np.save('${ROOT}/data/imdb/imdb_trn4k.npy', imdb[:4000])
"

python -u exp_clevr/train_clevr_gt_layout.py --data_root ${ROOT} \
    --exp_name ${GT} --max_iter 40000 --seed ${SEED} --device_data_bf16
echo "=== gt cloning done $(date) ==="

for split in val tst trn4k; do
    python -u exp_clevr/eval_clevr.py --data_root ${ROOT} \
        --exp_name ${GT} --snapshot_name 00040000 --test_split $split
done
echo "=== gt eval done $(date) ==="

python -u exp_clevr/train_clevr_rl_gt_layout.py --data_root ${ROOT} \
    --exp_name ${RL} --max_iter 20000 --seed ${SEED} --device_data_bf16 \
    --pretrained_model ${ROOT}/tfmodel/${GT}/00040000
echo "=== rl fine-tune done $(date) ==="

for split in val tst; do
    python -u exp_clevr/eval_clevr.py --data_root ${ROOT} \
        --exp_name ${RL} --snapshot_name 00020000 --test_split $split
done
echo "CHAIN-DONE seed=${SEED} $(date)"
