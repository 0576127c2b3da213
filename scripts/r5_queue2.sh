#!/bin/bash
# Round-5 TPU queue, stage 2 (waits for scripts/r5_queue.sh):
#   0. VQA flagship re-run (seed-0 GT training already on disk; the first
#      attempt's select-by-val eval OOM'd scoped VMEM in fused_find at
#      14x14x1024 geometry — kernels.py now raises vmem_limit_bytes).
#      run_seed() is idempotent: finished trainings are skipped.
#   5. seed-gap diagnosis: continue flag_v21_gtfull_s1 for +40k from its
#      40k snapshot — if the ~90% train-accuracy plateau persists, the
#      seed-0-vs-1/2 gap is an optimization basin (init luck), not
#      under-training (VERDICT r4 next #1 diagnosis)
#   6. pipelined anti-scaling attribution: sweep + traces at 2x{256,512,
#      1024} halves (VERDICT r4 next #5)
#   7. re-measure the corrupted gtfull bf16@1024 composed-serving cell
set -uo pipefail
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

if [ -f /tmp/r5_queue.pid ]; then
    while kill -0 "$(cat /tmp/r5_queue.pid)" 2>/dev/null; do
        sleep 60
    done
fi
echo "QUEUE2: stage-1 queue released the chip $(date)"

python -u -m n2nmn_tpu.tools.vqa_flagship --seeds 0 1 2 \
    || echo "VQA-FLAG FAILED (retry)"
echo "VQA-RETRY-DONE $(date)"

ROOT=./exp_clevr_flag
EXT="--num_mlp_ext --scene_ext --scene_bounded --count_mlp_ext"
python -u exp_clevr/train_clevr_gt_layout.py --data_root ${ROOT} \
    --exp_name flag_v21_gtfull_s1c --max_iter 40000 --seed 101 \
    --device_data_bf16 ${EXT} \
    --pretrained_model ${ROOT}/tfmodel/flag_v21_gtfull_s1/00040000 \
    || echo "CONTINUATION FAILED"
for split in val tst; do
    python -u exp_clevr/eval_clevr.py --data_root ${ROOT} \
        --exp_name flag_v21_gtfull_s1c --snapshot_name 00040000 \
        --test_split $split ${EXT} || echo "CONT-EVAL FAILED"
done
echo "CONTINUATION-DONE $(date)"

python -u -m n2nmn_tpu.tools.pipelined_eval --batch 512 1024 2048 \
    --iters 20 --trace_dir perf/traces_r5_pipe \
    --out perf/pipelined_eval_r5.json || echo "PIPE-SWEEP FAILED"
echo "PIPE-SWEEP-DONE $(date)"

python -u -m n2nmn_tpu.tools.trained_serving_bench \
    --data_root ./exp_clevr_flag --exp_name flag_v21_gtfull_s0 \
    --snapshot_name 00040000 --num_mlp_ext --scene_ext --scene_bounded \
    --count_mlp_ext --batch_sizes 1024 \
    --out perf/trained_serving_compose_gtfull_b1024_r5.json \
    || echo "B1024-REMEASURE FAILED"
echo "R5-QUEUE2-DONE $(date)"
