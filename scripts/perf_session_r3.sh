#!/bin/bash
# Round-3 TPU perf session: run AFTER the chip is free (check with
# kill -0 on the replicate pid). Uses the persistent compile cache.
set -x
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
cd /root/repo

# 1. decode-cost attribution with the DFA + dot-attention variants
python -m n2nmn_tpu.tools.decode_breakdown --batch_sizes 256 1024 \
    --out perf/decode_breakdown_r3b.json

# 2. flagship profile: auto transform (dot at 256/1024) + the new
#    bandwidth-bound MFU ceiling fields; trace at 1024 for attribution
python -m n2nmn_tpu.tools.profile_eval --batch_sizes 64 256 1024 \
    --out perf/profile_bf16_r3b.json
python -m n2nmn_tpu.tools.profile_eval --batch_sizes 1024 \
    --trace_dir perf/traces_r3 --trace_batch 1024 --out /dev/null
python -m n2nmn_tpu.tools.trace_ops perf/traces_r3 \
    --out perf/trace_ops_r3.json

# 3. headline bench (auto transform now default)
python bench.py | tee perf/bench_head_r3.json
