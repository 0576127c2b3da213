"""Stage-split profiling of the fused image->answer program (the
--from_images path: raw 320x480 BGR -> in-graph VGG-16 pool5 -> decode
-> module execution in ONE program), to attribute its MFU.

Components timed separately at each batch size:
  vgg_ms      jitted vgg16_pool5 alone (the conv FLOPs hot spot)
  nmn_ms      the feature-mode fused program (decode + executor)
  fused_ms    the full image->answer program
Overlap = vgg_ms + nmn_ms - fused_ms (XLA inter-stage scheduling).

MFU is reported per stage against the v5e bf16 peak, with the VGG's
analytic conv FLOPs (the backbone is ~99% of the program's FLOPs).

    python -m n2nmn_tpu.tools.profile_from_images --batch 16 32 64
    # optional: --trace_dir /tmp/fi_trace (fold with tools/trace_ops)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK_FLOPS = 197e12


def vgg_conv_flops(h=320, w=480):
    """Analytic MACs*2 of VGG-16 conv1_1..conv5_3 at input h x w."""
    from n2nmn_tpu.models.backbones import _VGG_BLOCKS
    total, in_c = 0.0, 3
    for bi, (block, channels) in enumerate(_VGG_BLOCKS):
        hh, ww = h // (2 ** bi), w // (2 ** bi)
        for out_c in channels:
            total += 2.0 * hh * ww * in_c * out_c * 9
            in_c = out_c
    return total


def _timeit(fn, args, iters):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, nargs="+", default=[16, 32, 64])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--questions_per_image", type=int, default=10,
                   help="dedup variant: M unique images x this many "
                        "questions via the image_idx gather (CLEVR "
                        "averages ~10)")
    p.add_argument("--f32", action="store_true")
    p.add_argument("--trace_dir", default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import bench as benchmod
    from n2nmn_tpu.models import backbones
    from n2nmn_tpu.models.nmn import NMNModel

    bf16 = not args.f32
    base = benchmod._flagship_model()
    cfg = dataclasses.replace(base.cfg, in_graph_vgg=True)
    model = NMNModel(cfg, base.grammar)
    params = model.init(jax.random.PRNGKey(0))
    feat_model = base
    if bf16:
        params = benchmod._cast_bf16(params)

    @jax.jit
    def fused(params, text_seq, seq_length, images, rng):
        out = model.apply(params, text_seq, seq_length, images, rng,
                          use_gt_layout=False, deterministic=True)
        return out.scores, out.tokens, out.validity

    @jax.jit
    def fused_dedup(params, text_seq, seq_length, images, image_idx, rng):
        out = model.apply(params, text_seq, seq_length, images, rng,
                          use_gt_layout=False, deterministic=True,
                          image_idx=image_idx)
        return out.scores, out.tokens, out.validity

    @jax.jit
    def nmn_only(params, text_seq, seq_length, feats, rng):
        out = feat_model.apply(params, text_seq, seq_length, feats, rng,
                               use_gt_layout=False, deterministic=True)
        return out.scores, out.tokens, out.validity

    vgg = jax.jit(lambda p, im: backbones.vgg16_pool5(p, im))

    t_enc = 45
    key = jax.random.PRNGKey(0)
    rng = jax.random.PRNGKey(1)
    idt = jnp.bfloat16 if bf16 else jnp.float32
    flops_vgg = vgg_conv_flops()
    results = {"device": str(jax.devices()[0]),
               "dtype": "bfloat16" if bf16 else "float32",
               "vgg_gflops_per_image": round(flops_vgg / 1e9, 1),
               "sweep": []}

    for n in args.batch:
        text = jax.random.randint(key, (t_enc, n), 0, 82, jnp.int32)
        sl = jnp.full((n,), t_enc, jnp.int32)
        imgs = (jax.random.uniform(key, (n, 320, 480, 3), jnp.float32)
                * 255.0).astype(idt)
        feats = jax.random.normal(key, (n, 10, 15, 512), idt)

        vgg_ms = _timeit(vgg, (params["vgg"], imgs), args.iters) * 1e3
        nmn_ms = _timeit(nmn_only,
                         (params, text, sl, feats, rng),
                         args.iters) * 1e3
        fused_ms = _timeit(fused, (params, text, sl, imgs, rng),
                           args.iters) * 1e3
        qpi = args.questions_per_image
        n_q = n * qpi
        text_q = jax.random.randint(key, (t_enc, n_q), 0, 82, jnp.int32)
        sl_q = jnp.full((n_q,), t_enc, jnp.int32)
        img_idx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), qpi)
        dedup_ms = _timeit(
            fused_dedup, (params, text_q, sl_q, imgs, img_idx, rng),
            args.iters) * 1e3

        row = {
            "batch": n,
            "vgg_ms": round(vgg_ms, 2),
            "nmn_ms": round(nmn_ms, 2),
            "fused_ms": round(fused_ms, 2),
            "overlap_ms": round(vgg_ms + nmn_ms - fused_ms, 2),
            "fused_qps": round(n / fused_ms * 1e3, 1),
            "dedup_qps": round(n_q / dedup_ms * 1e3, 1),
            "dedup_questions": n_q,
            "vgg_images_per_s": round(n / vgg_ms * 1e3, 1),
            "vgg_mfu": round(flops_vgg * n / (vgg_ms / 1e3)
                             / V5E_BF16_PEAK_FLOPS, 4),
        }
        print(row, flush=True)
        results["sweep"].append(row)

    if args.trace_dir:
        n = args.batch[-1]
        text = jax.random.randint(key, (t_enc, n), 0, 82, jnp.int32)
        sl = jnp.full((n,), t_enc, jnp.int32)
        imgs = (jax.random.uniform(key, (n, 320, 480, 3), jnp.float32)
                * 255.0).astype(idt)
        jax.block_until_ready(fused(params, text, sl, imgs, rng))
        with jax.profiler.trace(args.trace_dir):
            for _ in range(3):
                out = fused(params, text, sl, imgs, rng)
            jax.block_until_ready(out)
        results["trace_dir"] = args.trace_dir
        print(f"trace written to {args.trace_dir} "
              f"(fold: python -m n2nmn_tpu.tools.trace_ops "
              f"{args.trace_dir})", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
