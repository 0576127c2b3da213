#!/bin/bash
# Scan-unroll sweep at the flagship geometry, then the scratch-seed
# replication extension.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

N2NMN_SCAN_UNROLL=4 python -m n2nmn_tpu.tools.profile_eval \
    --batch_sizes 256 1024 --out perf/profile_bf16_unroll4.json
N2NMN_SCAN_UNROLL=2 python -m n2nmn_tpu.tools.profile_eval \
    --batch_sizes 256 1024 --out perf/profile_bf16_unroll2.json
echo "=== unroll sweep done: $(date) ==="

python -u -m n2nmn_tpu.tools.replicate --seeds 3 4 --skip_shapes \
    --skip_vqa --mini_configs scratch --out replication/results.jsonl
echo "=== scratch seeds done rc=$? $(date) ==="
