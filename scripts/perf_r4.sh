#!/bin/bash
# Round-4 TPU perf session (run AFTER the flag_v21 chain frees the
# chip). Stages are independent measurements; each records its own rc
# and the session continues, so one regression doesn't hide the rest.
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() {
    name=$1; shift
    echo "=== START $name $(date) ==="
    "$@" 2>&1 | tee /tmp/perf_r4_$name.log
    echo "=== DONE $name rc=${PIPESTATUS[0]} $(date) ==="
}

# 1. software-pipelined eval vs fused (cross-batch overlap)
run pipelined python -u -m n2nmn_tpu.tools.pipelined_eval \
    --batch 512 1024 2048 --iters 20 --out perf/pipelined_eval_r4.json

# 2. serving stream qps: dispatch-ahead depths 1/2/3 (host-fed batches)
run serve python -u -m n2nmn_tpu.tools.serve --batch_size 256 \
    --num_requests 4096

# 3. image->answer stage split (VGG vs NMN, overlap, MFU)
run from_images python -u -m n2nmn_tpu.tools.profile_from_images \
    --batch 16 32 64 --out perf/profile_from_images_r4.json

# 4. mini-VQA gt-text-attention supervision ablation
run txtatt python -u -m n2nmn_tpu.tools.txtatt_ablation \
    --root ./exp_vqa_mini --out replication/txtatt_ablation_r4.json

# 5. trained-snapshot serving on the new flagship model (v2.1 seed 0)
run trained_serving python -u -m n2nmn_tpu.tools.trained_serving_bench \
    --data_root ./exp_clevr_flag --exp_name flag_v21_gt_s0 \
    --snapshot_name 00040000 --batch_sizes 256 1024 \
    --out perf/trained_serving_flag_v21_r4.json

# 5b. same on the best RL fine-tune (s2, 90.2% test)
run trained_serving_rl python -u -m n2nmn_tpu.tools.trained_serving_bench \
    --data_root ./exp_clevr_flag --exp_name flag_v21_rl_s2 \
    --snapshot_name 00020000 --batch_sizes 256 1024 \
    --out perf/trained_serving_flag_v21_rl_r4.json

# 6. full bench (validates the new image-baseline fields)
run bench python -u bench.py

echo "PERF-SESSION-DONE $(date)"
