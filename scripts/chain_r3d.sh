#!/bin/bash
# Round-3d TPU chain: measure the int8 grid-streaming mode end to end.
# Sequential by design — only ONE process may hold the TPU.
# Fresh container: the jax compilation cache is cold, so compiles dominate
# the first runs; everything reuses JAX_COMPILATION_CACHE_DIR afterwards.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

# 0. (CPU) regenerate the mini-CLEVR benchmark data (gitignored)
python -m n2nmn_tpu.data.builders.mini_clevr --out_root ./exp_clevr_mini --seed 0

# 1. fresh-tunnel baseline profile at HEAD (fused FSP auto-on)
python -u -m n2nmn_tpu.tools.profile_eval \
    --batch_sizes 256 1024 --out perf/profile_base_r3d.json

# 2. int8 grid streaming profile, same geometry
N2NMN_GRID_INT8=1 python -u -m n2nmn_tpu.tools.profile_eval \
    --batch_sizes 256 1024 --out perf/profile_int8_r3d.json

# 3. VQA flagship geometry: base + int8
python -u -m n2nmn_tpu.tools.profile_eval --flavor vqa \
    --batch_sizes 64 256 --out perf/profile_vqa_base_r3d.json
N2NMN_GRID_INT8=1 python -u -m n2nmn_tpu.tools.profile_eval --flavor vqa \
    --batch_sizes 64 256 --out perf/profile_vqa_int8_r3d.json

# 4. retrain mini-CLEVR gt s0 (snapshots are gitignored; needed for the
#    accuracy-equivalence check below). Separate out file: these rows are
#    a container re-run, not part of the committed 5-seed replication.
python -u -m n2nmn_tpu.tools.replicate --seeds 0 --mini_configs gt \
    --skip_shapes --skip_vqa --out replication/results_r3d.jsonl

# 5. serving-mode equivalence on the trained snapshot:
#    f32 vs bf16 (regression) and f32 vs bf16+int8 grids (the new mode)
python -u -m n2nmn_tpu.tools.bf16_check --data_root ./exp_clevr_mini \
    --exp_name mini_clevr_gt_layout_s0 --snapshot_name 00060000 \
    --test_split tst --out exp_clevr_mini/results/bf16_equivalence_r3d.json
python -u -m n2nmn_tpu.tools.bf16_check --data_root ./exp_clevr_mini \
    --exp_name mini_clevr_gt_layout_s0 --snapshot_name 00060000 \
    --test_split tst --int8 \
    --out exp_clevr_mini/results/int8_equivalence_r3d.json

echo CHAIN-R3D-DONE
