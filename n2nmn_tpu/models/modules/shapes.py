"""SHAPES module library: {_Find, _Transform, _And} -> attention,
{_Answer} -> answer logits (reference models_shapes/nmn3_modules.py).

map_dim=500, Transform kernel 3 (reference :28,71). Text parameters come
from the decoder's word_vecs; the fc text mappings for all T decoder steps
are precomputed in one batched matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from n2nmn_tpu.ops.nn import init_fc, init_conv, apply_1x1_conv
from n2nmn_tpu.models.modules import common

ATT_MODULES = ["_Find", "_Transform", "_And"]
ANS_MODULES = ["_Answer"]

MAP_DIM = 500
TRANSFORM_KERNEL = 3


def init_params(key, image_dim, text_dim, num_choices, map_dim=MAP_DIM,
                dtype=jnp.float32):
    keys = jax.random.split(key, 8)
    return {
        "find": {
            "conv_image": init_fc(keys[0], image_dim, map_dim, dtype=dtype),
            "fc_text": init_fc(keys[1], text_dim, map_dim, dtype=dtype),
            "conv_eltwise": init_fc(keys[2], map_dim, 1, dtype=dtype),
        },
        "transform": {
            "conv_maps": init_conv(keys[3], TRANSFORM_KERNEL, 1, map_dim,
                                   dtype=dtype),
            "text_fc": init_fc(keys[4], text_dim, map_dim, dtype=dtype),
            "conv_eltwise": init_fc(keys[5], map_dim, 1, dtype=dtype),
        },
        "answer": {
            "fc_scores": init_fc(keys[6], 3, num_choices, dtype=dtype),
        },
    }


def precompute(params, image_feat, word_vecs):
    """Hoist all layout-independent matmuls out of the executor scan.

    image_feat: [N, H, W, D_im]; word_vecs: [T_dec, N, D_txt].
    Returns (pre_static, pre_step) for layout/executor.execute_layout.
    """
    n, h, w, _ = image_feat.shape
    t, _, d_txt = word_vecs.shape
    img_mapped = apply_1x1_conv(params["find"]["conv_image"],
                                image_feat).reshape(n, h * w, -1)
    wv_flat = word_vecs.reshape(t * n, d_txt)
    txt_find = (wv_flat @ params["find"]["fc_text"]["w"]
                + params["find"]["fc_text"]["b"]).reshape(t, n, -1)
    txt_tfm = (wv_flat @ params["transform"]["text_fc"]["w"]
               + params["transform"]["text_fc"]["b"]).reshape(t, n, -1)
    pre_static = {"img_find": img_mapped, "h": h, "w": w}
    # _Find is stack-independent: hoist all T steps out of the executor
    # scan (see common.find_core_all)
    att_find = common.find_core_all(img_mapped, txt_find,
                                    params["find"]["conv_eltwise"])
    pre_step = {"att_find": att_find}
    if common.transform_impl_for_batch(n) == "dot":
        pre_step.update(common.transform_dot_precompute(
            params["transform"]["conv_maps"],
            params["transform"]["conv_eltwise"], txt_tfm))
    else:
        pre_step["txt_tfm"] = txt_tfm
    return pre_static, pre_step


def make_branches(params):
    """Branch fns (pre_static, pre_t, in0, in1, t) -> [N, HW] / [N, C]."""

    def find(pre, pre_t, in0, in1, t):
        return pre_t["att_find"]

    def transform(pre, pre_t, in0, in1, t):
        if "tfm_kq" in pre_t:   # dot form (common.TRANSFORM_IMPL)
            return common.transform_dot_apply(
                in0, pre_t, params["transform"]["conv_eltwise"],
                pre["h"], pre["w"], TRANSFORM_KERNEL)
        maps = common.conv_on_attention(in0, params["transform"]["conv_maps"],
                                        pre["h"], pre["w"])
        from n2nmn_tpu.ops.nn import l2_normalize
        elt = l2_normalize(maps * pre_t["txt_tfm"][:, None, :], axis=2)
        return common.project_to_att(elt, params["transform"]["conv_eltwise"])

    def and_(pre, pre_t, in0, in1, t):
        return jnp.minimum(in0, in1)

    def answer(pre, pre_t, in0, in1, t):
        feats = common.min_avg_max(in0)
        p = params["answer"]["fc_scores"]
        return feats @ p["w"] + p["b"]

    return [find, transform, and_], [answer]
