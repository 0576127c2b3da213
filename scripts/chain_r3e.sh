#!/bin/bash
# Round-3e TPU chain: measure ENC_INT8 (decoder enc-tensor int8
# streaming) — runs after chain_r3d.sh (which trains the snapshot the
# equivalence checks need). Sequential: one TPU holder at a time.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

# 1. decode attribution incl. the attn_xla_int8 component scan
python -u -m n2nmn_tpu.tools.decode_breakdown \
    --batch_sizes 256 1024 --out perf/decode_breakdown_r3e.json

# 2. ENC_INT8 alone (vs perf/profile_base_r3d.json)
N2NMN_ENC_INT8=1 python -u -m n2nmn_tpu.tools.profile_eval \
    --batch_sizes 256 1024 --out perf/profile_enc_int8_r3e.json

# 3. both int8 modes together (the full serving-quantization candidate)
N2NMN_GRID_INT8=1 N2NMN_ENC_INT8=1 python -u -m n2nmn_tpu.tools.profile_eval \
    --batch_sizes 256 1024 --out perf/profile_both_int8_r3e.json

# 4. VQA flagship geometry, both modes
N2NMN_GRID_INT8=1 N2NMN_ENC_INT8=1 python -u -m n2nmn_tpu.tools.profile_eval \
    --flavor vqa --batch_sizes 64 256 --out perf/profile_vqa_both_int8_r3e.json

# 4b. small-batch latency regime: the decode dispatch floor dominates
#     there (batch-64 decode = 3.4x roofline) — sweep the unroll knob
#     where it might actually pay, plus the int8 modes
python -u -m n2nmn_tpu.tools.profile_eval \
    --batch_sizes 16 64 --out perf/profile_base_small_r3e.json
N2NMN_SCAN_UNROLL=2 python -u -m n2nmn_tpu.tools.profile_eval \
    --batch_sizes 16 64 --out perf/profile_unroll2_small_r3e.json
N2NMN_SCAN_UNROLL=4 python -u -m n2nmn_tpu.tools.profile_eval \
    --batch_sizes 16 64 --out perf/profile_unroll4_small_r3e.json
N2NMN_GRID_INT8=1 N2NMN_ENC_INT8=1 python -u -m n2nmn_tpu.tools.profile_eval \
    --batch_sizes 16 64 --out perf/profile_both_int8_small_r3e.json

# 5. trained-snapshot equivalence: enc-int8 alone, then the full stack
python -u -m n2nmn_tpu.tools.bf16_check --data_root ./exp_clevr_mini \
    --exp_name mini_clevr_gt_layout_s0 --snapshot_name 00060000 \
    --test_split tst --enc_int8 \
    --out exp_clevr_mini/results/enc_int8_equivalence_r3e.json
python -u -m n2nmn_tpu.tools.bf16_check --data_root ./exp_clevr_mini \
    --exp_name mini_clevr_gt_layout_s0 --snapshot_name 00060000 \
    --test_split tst --int8 --enc_int8 \
    --out exp_clevr_mini/results/full_int8_equivalence_r3e.json

# 6. early-exit decode on the trained snapshot: predictions must be
#    identical (post-eos steps are no-ops); eval_seconds_variant vs
#    eval_seconds_f32 is the honest trained-model serving measurement
python -u -m n2nmn_tpu.tools.bf16_check --data_root ./exp_clevr_mini \
    --exp_name mini_clevr_gt_layout_s0 --snapshot_name 00060000 \
    --test_split tst --early_exit \
    --out exp_clevr_mini/results/early_exit_equivalence_r3e.json

# 7. the full serving stack: bf16 + int8 grids + int8 enc + early exit
python -u -m n2nmn_tpu.tools.bf16_check --data_root ./exp_clevr_mini \
    --exp_name mini_clevr_gt_layout_s0 --snapshot_name 00060000 \
    --test_split tst --int8 --enc_int8 --early_exit \
    --out exp_clevr_mini/results/full_serving_equivalence_r3e.json

echo CHAIN-R3E-DONE
