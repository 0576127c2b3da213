#!/bin/bash
# Round-5 TPU queue, stage 3 (waits for scripts/r5_queue2.sh):
#   8. third from-scratch flagship seed — seeds 0/1 landed 93.4%/50.3%
#      (bimodal policy collapse); a third seed pins the basin odds.
set -uo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

if [ -f /tmp/r5_queue2.pid ]; then
    while kill -0 "$(cat /tmp/r5_queue2.pid)" 2>/dev/null; do
        sleep 60
    done
fi
echo "QUEUE3: stage-2 queue released the chip $(date)"

python -u -m n2nmn_tpu.tools.scratch_flagship --seeds 2 \
    || echo "SCRATCH-S2 FAILED"
echo "R5-QUEUE3-DONE $(date)"
