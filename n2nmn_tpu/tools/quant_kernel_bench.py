"""Per-op microbench for the int8 grid-streaming variants.

CAVEAT (measured, round 3g): the isolated READOUT cases cannot be
trusted — XLA repeatedly restructures softmax@grid into forms that read
a fraction of the grid (observed: scalar-shift cancellation through the
softmax, reduction reassociation through a linear fold, and finally a
convolution-base-dilated lowering whose cost analysis reads ~13% of the
grid per step), so those rows measure BELOW the physical HBM floor and
are tagged "below_floor_suspect". In-program measurements (trace_ops,
profile_eval) are the only valid evidence for the readout; the FIND
cases (l2norm is not shift/scale-factorable) are physically consistent
with the in-program numbers and are the rows this tool exists for.

The end-to-end int8 profile regressed (perf/profile_int8_r3d.json:
48.7k -> 37.6k q/s at N=256) even though it halves the HBM bytes of the
two dominant executor ops — this tool isolates WHICH variant loses and
against what. For each op it times a T-step scan (the executor's actual
consumption pattern: grid loop-invariant, re-read per step):

  readout/xla_bf16     stacked softmax-readout einsum (production path)
  readout/pallas_bf16  fused_readout applied per k (round-1 kernel)
  readout/pallas_int8  fused_readout_q (int8 grid, dequant in VMEM)
  readout/xla_int8     einsum against q.astype(bf16) * scale — does XLA
                       fuse the dequant into the matmul load or
                       materialize a converted copy per step?
  find/xla_bf16        l2norm-project XLA path (modules/common.find_core)
  find/pallas_bf16     fused_find (the round-3 winner)
  find/pallas_int8     fused_find_q
  find/xla_int8        find_core over q.astype(bf16) (scale folded in txt)

Usage: python -m n2nmn_tpu.tools.quant_kernel_bench \
           [--batch 1024] [--hw 150] [--d 512] [--map_dim 250] [--steps 20]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def _timeit(fn, args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def _scan20(body, steps):
    """Wrap a per-step op into a T-step scan with a tiny carry chain so
    XLA cannot hoist it (mirrors the executor's per-step consumption)."""
    def fn(*args):
        def step(c, _):
            y = body(c, *args)
            # nonlinear per-element fold: a plain mean(y) lets XLA
            # reassociate sum(sm @ img) into sm @ rowsum(img) and hoist
            # the grid reduction out of the scan (observed: the readout
            # cases measured 0.03 ms against a 3.8 ms streaming floor)
            return c + jnp.mean(jnp.tanh(y)).astype(c.dtype), None
        return jax.lax.scan(step, jnp.zeros((), jnp.float32), None,
                            length=steps)[0]
    return jax.jit(fn)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--hw", type=int, default=150)
    p.add_argument("--d", type=int, default=512)
    p.add_argument("--map_dim", type=int, default=250)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from n2nmn_tpu.ops.pallas.kernels import (
        fused_find, fused_find_q, fused_readout, fused_readout_q,
        quantize_grid)
    from n2nmn_tpu.ops.nn import l2_normalize

    n, hw, d, md, T = args.batch, args.hw, args.d, args.map_dim, args.steps
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    dt = jnp.bfloat16
    img = jax.random.normal(ks[0], (n, hw, d), dt)          # readout grid
    att = jax.random.normal(ks[1], (n, 2, hw), dt)          # two readouts
    imgm = jax.random.normal(ks[2], (n, hw, md), dt)        # mapped grid
    txt = jax.random.normal(ks[3], (n, md), dt)
    w = jax.random.normal(ks[4], (md,), dt)
    b = jnp.bfloat16(0.1)
    img_q, img_s = quantize_grid(img)
    imgm_q, imgm_s = quantize_grid(imgm)
    img_s16 = img_s.astype(dt)
    txt_eff = txt * imgm_s.astype(dt)

    # carry injection must be MULTIPLICATIVE for the readouts: softmax
    # is shift-invariant and XLA's algebraic simplifier cancels an added
    # scalar (exp(a+c)/sum exp(a+c)), hoisting the whole readout out of
    # the scan (observed: 0.02 ms against a 3.8 ms streaming floor)
    def _jitter(att, c):
        return att * (1.0 + c).astype(att.dtype)

    def ro_xla(c, att, img):
        sm = jax.nn.softmax(_jitter(att, c), axis=2)
        return jnp.einsum("nkp,npd->nkd", sm, img)

    def ro_pl_bf16(c, att, img):
        a = _jitter(att, c)
        return jnp.stack([fused_readout(a[:, 0], img),
                          fused_readout(a[:, 1], img)], axis=1)

    def ro_pl_int8(c, att, q, s):
        return fused_readout_q(_jitter(att, c), q, s, att.dtype)

    def ro_xla_int8(c, att, q, s):
        sm = jax.nn.softmax(_jitter(att, c), axis=2)
        deq = q.astype(att.dtype) * s[:, None, :]
        return jnp.einsum("nkp,npd->nkd", sm, deq)

    def find_xla(c, imgm, txt):
        elt = l2_normalize(imgm * (txt + c.astype(txt.dtype))[:, None, :],
                           axis=2)
        return jnp.einsum("npd,d->np", elt, w) + b

    def find_pl_bf16(c, imgm, txt):
        return fused_find(imgm, txt + c.astype(txt.dtype), w, b)

    def find_pl_int8(c, q, txt_eff):
        return fused_find_q(q, txt_eff + c.astype(txt_eff.dtype), w, b,
                            txt_eff.dtype)

    def find_xla_int8(c, q, s, txt):
        deq = q.astype(txt.dtype) * s[:, None, :].astype(txt.dtype)
        elt = l2_normalize(deq * (txt + c.astype(txt.dtype))[:, None, :],
                           axis=2)
        return jnp.einsum("npd,d->np", elt, w) + b

    cases = {
        "readout/xla_bf16": (ro_xla, (att, img)),
        "readout/pallas_bf16": (ro_pl_bf16, (att, img)),
        "readout/pallas_int8": (ro_pl_int8, (att, img_q, img_s16)),
        "readout/xla_int8": (ro_xla_int8, (att, img_q, img_s16)),
        "find/xla_bf16": (find_xla, (imgm, txt)),
        "find/pallas_bf16": (find_pl_bf16, (imgm, txt)),
        "find/pallas_int8": (find_pl_int8, (imgm_q, txt_eff)),
        "find/xla_int8": (find_xla_int8, (imgm_q, imgm_s, txt)),
    }
    hbm_gbps = 819e9
    report = {"batch": n, "hw": hw, "d": d, "map_dim": md, "steps": T,
              "floors_ms": {
                  # one grid read per step
                  "readout_bf16": T * n * hw * d * 2 / hbm_gbps * 1e3,
                  "readout_int8": T * n * hw * d * 1 / hbm_gbps * 1e3,
                  "find_bf16": T * n * hw * md * 2 / hbm_gbps * 1e3,
                  "find_int8": T * n * hw * md * 1 / hbm_gbps * 1e3,
              },
              "cases": {}}
    floors = {"readout": report["floors_ms"]["readout_int8"],
              "find": report["floors_ms"]["find_int8"]}
    for name, (body, xs) in cases.items():
        try:
            dt_s = _timeit(_scan20(body, T), xs)
            ms = round(dt_s * 1e3, 3)
            # a variant can't beat the int8 streaming floor of its op:
            # if it did, XLA elided the grid read and the row is invalid
            suspect = ms < 0.5 * floors[name.split("/")[0]]
            report["cases"][name] = (
                {"ms": ms, "below_floor_suspect": True} if suspect else ms)
            print(f"{name}: {ms:.3f} ms /{T}-step scan"
                  + (" [BELOW FLOOR — elided, invalid]" if suspect else ""),
                  flush=True)
        except Exception as e:
            report["cases"][name] = "error: " + repr(e)[:200]
            print(f"{name}: ERROR {e!r}", flush=True)

    print(json.dumps(report))
    if args.out:
        import os
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
