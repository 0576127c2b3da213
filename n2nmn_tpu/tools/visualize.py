"""Module-attention visualization: run a batch through the model with
executor intermediates and dump per-step attention grids.

Replaces the reference's exp_shapes/visualize_shapes.ipynb, which had to
re-instantiate every module *outside* TensorFlow Fold with placeholder
inputs and replay assembled trees node by node — here the executor simply
returns its per-step attention outputs."""

from __future__ import annotations

import os

import jax
import numpy as np

from n2nmn_tpu.layout.executor import execute_layout
from n2nmn_tpu.models.nmn import NMNModel


def run_with_attentions(model: NMNModel, params, text_seq, seq_length,
                        image_input, rng):
    """Greedy forward pass returning per-step module attentions.

    Returns dict with tokens [T,N], module_names (list of list per
    example), scores, predictions, validity, step_atts [T, N, H, W]."""
    cfg = model.cfg

    def fwd(params, text_seq, seq_length, image_input, rng):
        from n2nmn_tpu.models.netgen import run_netgen
        from n2nmn_tpu.models import backbones
        from n2nmn_tpu.ops.nn import apply_1x1_conv

        rng, net_rng = jax.random.split(rng)
        net_out = run_netgen(
            params["netgen"], cfg.netgen, model.grammar_arrays,
            text_seq, seq_length, net_rng, deterministic=True)
        image_feat = image_input
        if cfg.in_graph_cnn:
            image_feat = backbones.shapes_convnet(params["convnet"],
                                                  image_input)
        if cfg.reduce_visfeat_dim:
            image_feat = apply_1x1_conv(params["reduce_visfeat"],
                                        image_feat)
        pre_static, pre_step = model.lib.precompute(
            params["modules"], image_feat, net_out.word_vecs)
        att_b, ans_b = model.lib.make_branches(params["modules"])
        scores, validity, step_atts = execute_layout(
            net_out.tokens, model.tables, att_b, ans_b, pre_static,
            pre_step, hw=cfg.H_feat * cfg.W_feat,
            num_choices=cfg.num_choices,
            stack_size=cfg.netgen.T_decoder, return_intermediates=True)
        return net_out.tokens, scores, validity, step_atts, net_out.atts

    tokens, scores, validity, step_atts, txt_atts = jax.jit(fwd)(
        params, text_seq, seq_length, image_input, rng)

    tokens = np.asarray(tokens)
    T, N = tokens.shape
    module_names = [[model.grammar.module_names[tokens[t, n]]
                     for t in range(T)] for n in range(N)]
    return {
        "tokens": tokens,
        "module_names": module_names,
        "scores": np.asarray(scores),
        "predictions": np.argmax(np.asarray(scores), axis=1),
        "validity": np.asarray(validity),
        "step_atts": np.asarray(step_atts).reshape(
            T, N, cfg.H_feat, cfg.W_feat),
        "question_atts": np.asarray(txt_atts),
    }


def save_attention_maps(result, out_dir, example_ids=None,
                        answer_words=None):
    """Write per-example npz (+ png grids when matplotlib is present)."""
    os.makedirs(out_dir, exist_ok=True)
    n_total = result["tokens"].shape[1]
    example_ids = example_ids if example_ids is not None else range(n_total)
    for n in example_ids:
        names = result["module_names"][n]
        np.savez(os.path.join(out_dir, f"example_{n:04d}.npz"),
                 tokens=result["tokens"][:, n],
                 module_names=np.array(names),
                 step_atts=result["step_atts"][:, n],
                 scores=result["scores"][n])
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            steps = [t for t, m in enumerate(names) if m != "<eos>"]
            if not steps:
                continue
            fig, axes = plt.subplots(1, len(steps),
                                     figsize=(3 * len(steps), 3))
            if len(steps) == 1:
                axes = [axes]
            for ax, t in zip(axes, steps):
                ax.imshow(result["step_atts"][t, n], cmap="viridis")
                ax.set_title(f"t={t} {names[t]}")
                ax.axis("off")
            pred = result["predictions"][n]
            label = (answer_words[pred] if answer_words is not None
                     else str(pred))
            fig.suptitle(f"prediction: {label} "
                         f"(valid={bool(result['validity'][n])})")
            fig.savefig(os.path.join(out_dir, f"example_{n:04d}.png"),
                        bbox_inches="tight")
            plt.close(fig)
        except ImportError:
            pass
