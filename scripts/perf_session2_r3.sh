#!/bin/bash
# Re-measure after the bit-packed DFA + slice-based attention_patches
# changes. Waits for the prior chain (pid $1) to release the TPU.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

while kill -0 "$1" 2>/dev/null; do sleep 15; done
echo "=== TPU free: $(date) ==="

python -m n2nmn_tpu.tools.decode_breakdown --batch_sizes 256 1024 \
    --skip_fused --out perf/decode_breakdown_r3c.json
python -m n2nmn_tpu.tools.profile_eval --batch_sizes 64 256 1024 \
    --out perf/profile_bf16_r3c.json
python -m n2nmn_tpu.tools.profile_eval --batch_sizes 1024 \
    --trace_dir perf/traces_r3c --trace_batch 1024 --out /dev/null
python -m n2nmn_tpu.tools.trace_ops perf/traces_r3c \
    --out perf/trace_ops_r3c.json
python bench.py | tee perf/bench_head_r3b.json
echo "=== perf session 2 done: $(date) ==="
