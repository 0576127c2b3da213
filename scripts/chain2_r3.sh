#!/bin/bash
# Follow-on: wait for the perf-session chain (pid $1), then extend the
# from-scratch mini-CLEVR replication to 5 seeds.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

while kill -0 "$1" 2>/dev/null; do sleep 30; done
echo "=== perf session done, TPU free: $(date) ==="

python -u -m n2nmn_tpu.tools.replicate --seeds 3 4 --skip_shapes \
    --skip_vqa --mini_configs scratch --out replication/results.jsonl
echo "=== scratch seeds done rc=$? $(date) ==="
