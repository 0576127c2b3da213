#!/bin/bash
# Round-3 TPU work chain: runs after the mini-VQA fleet finishes.
# Sequential by design — only ONE process may hold the TPU.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

# 1. decode-scan attribution: XLA vs fused-Pallas attention
python -u -m n2nmn_tpu.tools.decode_breakdown \
    --batch_sizes 256 1024 --out perf/decode_breakdown_r3.json

# 2. flagship CLEVR phase profile with the corrected decode roofline
python -u -m n2nmn_tpu.tools.profile_eval \
    --batch_sizes 256 1024 --out perf/profile_bf16_r3.json

# 3. same with the fused attention kernel enabled
N2NMN_FUSED_ATTENTION=1 python -u -m n2nmn_tpu.tools.profile_eval \
    --batch_sizes 256 1024 --out perf/profile_bf16_fusedattn_r3.json

# 4. VQA flagship geometry profile (VERDICT r2 next-#7)
python -u -m n2nmn_tpu.tools.profile_eval --flavor vqa \
    --batch_sizes 64 256 --out perf/profile_vqa_bf16_r3.json

# 5. mini-CLEVR seeds 3,4 (gt + rl) -> 5-seed replication
python -u -m n2nmn_tpu.tools.replicate --seeds 3 4 \
    --skip_shapes --skip_vqa --mini_configs gt,rl \
    --out replication/results.jsonl

echo CHAIN-DONE
