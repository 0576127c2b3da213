"""Hand-derived value tests for individual module semantics (the
reference's module math, models_clevr/nmn3_modules.py et al)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from n2nmn_tpu.models.modules import common, clevr, shapes, vqa
from n2nmn_tpu.ops.nn import l2_normalize


def test_min_avg_max():
    att = jnp.asarray([[1.0, 2.0, 3.0], [-1.0, 0.0, 1.0]])
    out = np.asarray(common.min_avg_max(att))
    np.testing.assert_allclose(out, [[1, 2, 3], [-1, 0, 1]])


def test_flat_min_max():
    att = jnp.asarray([[1.0, 2.0, 3.0]])
    out = np.asarray(common.flat_min_max(att))
    np.testing.assert_allclose(out, [[1, 2, 3, 1, 3]])


def test_find_core_hand_value():
    # 1 example, 2 cells, 2 channels
    img = jnp.asarray([[[3.0, 4.0], [1.0, 0.0]]])   # [1, 2, 2]
    txt = jnp.asarray([[1.0, 1.0]])                  # [1, 2]
    proj = {"w": jnp.asarray([[1.0], [0.0]]), "b": jnp.asarray([0.5])}
    out = np.asarray(common.find_core(img, txt, proj))
    # cell 0: e=(3,4), normalized (0.6, 0.8) -> 0.6 + 0.5
    # cell 1: e=(1,0), normalized (1, 0)     -> 1.0 + 0.5
    np.testing.assert_allclose(out, [[1.1, 1.5]], rtol=1e-6)


def test_find_core_all_matches_per_step():
    """The hoisted all-steps matmul form must reproduce the per-step
    elementwise find_core (same math, reassociated)."""
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    T, N, HW, D = 5, 4, 12, 16
    img = jax.random.normal(k1, (N, HW, D))
    txt = jax.random.normal(k2, (T, N, D))
    proj = {"w": jax.random.normal(k3, (D, 1)), "b": jnp.asarray([0.25])}
    all_steps = np.asarray(common.find_core_all(img, txt, proj))
    assert all_steps.shape == (T, N, HW)
    for t in range(T):
        ref = np.asarray(common.find_core(img, txt[t], proj))
        np.testing.assert_allclose(all_steps[t], ref, rtol=1e-5, atol=1e-6)


def test_find_core_all_zero_image_is_finite():
    """eps guard: an all-zero image row must not produce inf/nan (matches
    l2_normalize's max(sum_sq, eps) semantics)."""
    img = jnp.zeros((1, 3, 4))
    txt = jnp.ones((2, 1, 4))
    proj = {"w": jnp.ones((4, 1)), "b": jnp.asarray([0.5])}
    out = np.asarray(common.find_core_all(img, txt, proj))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out, 0.5)


@pytest.mark.parametrize("h,w,k,map_dim", [(3, 3, 3, 32), (5, 6, 5, 24)])
def test_transform_dot_matches_conv_form(h, w, k, map_dim):
    """The dot-form _Transform (patch-space quadratic) must reproduce the
    conv-form project(l2norm(conv(att) * txt)) for SHAPES (k=3) and CLEVR
    (k=5) kernel sizes."""
    key = jax.random.PRNGKey(11)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    T, N = 4, 3
    att = jax.random.normal(k1, (N, h * w))
    txt = jax.random.normal(k2, (T, N, map_dim))
    conv_params = {"w": jax.random.normal(k3, (k, k, 1, map_dim)) * 0.3,
                   "b": jax.random.normal(k4, (map_dim,)) * 0.1}
    proj = {"w": jax.random.normal(k1, (map_dim, 1)),
            "b": jnp.asarray([0.7])}

    pre_t_all = common.transform_dot_precompute(conv_params, proj, txt)
    for t in range(T):
        maps = common.conv_on_attention(att, conv_params, h, w)
        elt = l2_normalize(maps * txt[t][:, None, :], axis=2)
        ref = np.asarray(common.project_to_att(elt, proj))
        pre_t = {kk: v[t] for kk, v in pre_t_all.items()}
        got = np.asarray(common.transform_dot_apply(att, pre_t, proj,
                                                    h, w, k))
        np.testing.assert_allclose(got, ref, rtol=5e-5, atol=5e-6)


def test_transform_dot_gradients_match_conv_form():
    """Both _Transform implementations must produce the same gradients
    w.r.t. the attention input, the conv kernel, and the text map — the
    dot form is usable in training, not just serving."""
    key = jax.random.PRNGKey(21)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    h, w, k, map_dim, N = 4, 5, 3, 16, 3
    att = jax.random.normal(k1, (N, h * w))
    txt = jax.random.normal(k2, (1, N, map_dim))
    conv_params = {"w": jax.random.normal(k3, (k, k, 1, map_dim)) * 0.3,
                   "b": jax.random.normal(k4, (map_dim,)) * 0.1}
    proj = {"w": jax.random.normal(k1, (map_dim, 1)),
            "b": jnp.asarray([0.7])}

    def loss_conv(att, conv_params, txt):
        maps = common.conv_on_attention(att, conv_params, h, w)
        elt = l2_normalize(maps * txt[0][:, None, :], axis=2)
        return jnp.sum(common.project_to_att(elt, proj) ** 2)

    def loss_dot(att, conv_params, txt):
        pre_t_all = common.transform_dot_precompute(conv_params, proj, txt)
        pre_t = {kk: v[0] for kk, v in pre_t_all.items()}
        return jnp.sum(
            common.transform_dot_apply(att, pre_t, proj, h, w, k) ** 2)

    g_conv = jax.grad(loss_conv, argnums=(0, 1, 2))(att, conv_params, txt)
    g_dot = jax.grad(loss_dot, argnums=(0, 1, 2))(att, conv_params, txt)
    for gc, gd in zip(jax.tree_util.tree_leaves(g_conv),
                      jax.tree_util.tree_leaves(g_dot)):
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gc),
                                   rtol=5e-4, atol=5e-6)


def test_attention_patches_order_matches_conv():
    """attention_patches channel order must match HWIO kernel reshape:
    patches @ K.reshape(k*k, C) == conv(att, K)."""
    key = jax.random.PRNGKey(5)
    h, w, k, c = 4, 5, 3, 7
    att = jax.random.normal(key, (2, h * w))
    kern = {"w": jax.random.normal(key, (k, k, 1, c)),
            "b": jnp.zeros((c,))}
    conv = np.asarray(common.conv_on_attention(att, kern, h, w))
    P = np.asarray(common.attention_patches(att, h, w, k))
    K = np.asarray(kern["w"]).reshape(k * k, c)
    np.testing.assert_allclose(P @ K, conv, rtol=1e-5, atol=1e-6)


def test_att_softmax_readout_uniform():
    att = jnp.zeros((1, 4))                  # uniform softmax
    img = jnp.asarray(np.arange(8, dtype=np.float32).reshape(1, 4, 2))
    out = np.asarray(common.att_softmax_readout(att, img))
    np.testing.assert_allclose(out, img.mean(axis=1), rtol=1e-6)


def test_and_or_min_max():
    att_b, ans_b = clevr.make_branches(
        clevr.init_params(jax.random.PRNGKey(0), 4, 4, 3, hw=6))
    a = jnp.asarray([[1.0, -2.0, 3.0, 0.0, 5.0, -6.0]])
    b = jnp.asarray([[0.0, 1.0, 2.0, 3.0, 4.0, 5.0]])
    and_out = np.asarray(att_b[5](None, None, a, b, 0))
    or_out = np.asarray(att_b[6](None, None, a, b, 0))
    np.testing.assert_allclose(and_out, np.minimum(a, b))
    np.testing.assert_allclose(or_out, np.maximum(a, b))


def test_scene_constant():
    params = clevr.init_params(jax.random.PRNGKey(0), 4, 4, 3, hw=6)
    att_b, _ = clevr.make_branches(params)
    pre = {"img_find": jnp.zeros((2, 6, 4))}
    out = np.asarray(att_b[0](pre, None, None, None, 0))
    np.testing.assert_allclose(out, 3.0)  # SceneModule pos_val=3


def test_vqa_coordinate_map():
    img = jnp.zeros((1, 2, 3, 4))
    with_coords = np.asarray(vqa.add_spatial_coordinate_map(img))
    assert with_coords.shape == (1, 2, 3, 6)
    # x map: linspace(-1, 1, W=3) per column
    np.testing.assert_allclose(with_coords[0, 0, :, 4], [-1.0, 0.0, 1.0])
    # y map: linspace(-1, 1, H=2) per row
    np.testing.assert_allclose(with_coords[0, :, 0, 5], [-1.0, 1.0])


def test_shapes_answer_head():
    params = shapes.init_params(jax.random.PRNGKey(0), 8, 8, 2)
    _, ans_b = shapes.make_branches(params)
    att = jnp.asarray([[0.0, 6.0, 3.0]])
    out = np.asarray(ans_b[0](None, None, att, None, 0))
    expected = np.asarray(
        jnp.asarray([[0.0, 3.0, 6.0]]) @ params["answer"]["fc_scores"]["w"]
        + params["answer"]["fc_scores"]["b"])
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_deconv_and_pool_shapes():
    from n2nmn_tpu.ops.nn import (init_deconv, apply_deconv, max_pool,
                                  init_conv, apply_conv)
    key = jax.random.PRNGKey(0)
    x = jnp.ones((2, 8, 8, 4))
    p = init_deconv(key, 2, 4, 6)
    y = apply_deconv(p, x, stride=2)
    assert y.shape == (2, 16, 16, 6)
    assert max_pool(x, 2, 2).shape == (2, 4, 4, 4)
    # conv VALID path (shapes convnet uses it)
    pc = init_conv(key, 3, 4, 5)
    assert apply_conv(pc, x, stride=1, padding="VALID").shape == (2, 6, 6, 5)
