"""Pallas kernel equivalence tests (interpret mode on CPU): forward and
gradients must match the pure-XLA reference implementations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from n2nmn_tpu.ops.pallas.kernels import fused_find, fused_readout
from n2nmn_tpu.ops.nn import l2_normalize


def ref_find(img_mapped, txt, w, b):
    elt = l2_normalize(img_mapped * txt[:, None, :], axis=2)
    return jnp.einsum("npd,d->np", elt, w) + b


def ref_readout(att, img):
    s = jax.nn.softmax(att, axis=1)
    return jnp.einsum("np,npd->nd", s, img)


@pytest.mark.parametrize("n,hw,d", [(4, 150, 250), (2, 9, 64), (3, 196, 32)])
def test_fused_find_forward(n, hw, d):
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    img = jax.random.normal(k1, (n, hw, d))
    txt = jax.random.normal(k2, (n, d))
    w = jax.random.normal(k3, (d,))
    b = jnp.float32(0.3)
    out = fused_find(img, txt, w, b)
    ref = ref_find(img, txt, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_find_grads():
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    img = jax.random.normal(k1, (3, 20, 16))
    txt = jax.random.normal(k2, (3, 16))
    w = jax.random.normal(k3, (16,))
    b = jnp.float32(-0.1)

    def loss_p(img, txt, w, b):
        return jnp.sum(fused_find(img, txt, w, b) ** 2)

    def loss_r(img, txt, w, b):
        return jnp.sum(ref_find(img, txt, w, b) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(img, txt, w, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(img, txt, w, b)
    for a, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("n,hw,d", [(4, 150, 512), (2, 9, 64)])
def test_fused_readout_forward(n, hw, d):
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    att = jax.random.normal(k1, (n, hw))
    img = jax.random.normal(k2, (n, hw, d))
    out = fused_readout(att, img)
    ref = ref_readout(att, img)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_fsp_branch_matches_xla(monkeypatch):
    """N2NMN_FUSED_FSP routes _FindSameProperty through fused_find with the
    text vector pre-multiplied by the attended-feature mapping; must equal
    the XLA l2norm-project path exactly (elementwise associativity)."""
    from n2nmn_tpu.models.modules import clevr, common

    params = clevr.init_params(jax.random.PRNGKey(0), 6, 5, 3, hw=12)
    image_feat = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 4, 6))
    word_vecs = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 5))
    in0 = jax.random.normal(jax.random.PRNGKey(3), (4, 12))
    idx = clevr.ATT_MODULES.index("_FindSameProperty")

    def loss(params, in0):
        pre, pre_step = clevr.precompute(params, image_feat, word_vecs)
        pre_t = {"txt_fsp": pre_step["txt_fsp"][0]}
        att_b, _ = clevr.make_branches(params)
        out = att_b[idx](pre, pre_t, in0, None, 0)
        return jnp.sum(out ** 2), out

    (ref_l, ref_out), ref_g = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(params, in0)
    monkeypatch.setattr(common, "USE_FUSED_FSP", True)
    (fus_l, fus_out), fus_g = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(params, in0)

    np.testing.assert_allclose(np.asarray(fus_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    for a, r in zip(jax.tree.leaves(fus_g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_fused_fsp_vqa_transform_matches_xla(monkeypatch):
    """VQA's _Transform is the same l2norm(grid * txt * att)->project
    pattern (reference models_vqa/nmn3_modules.py:123-171); the fused
    route must match the XLA path in value and grads."""
    from n2nmn_tpu.models.modules import vqa, common

    params = vqa.init_params(jax.random.PRNGKey(0), 6, 5, 3, map_dim=8)
    image_feat = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 4, 6))
    word_vecs = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 5))
    in0 = jax.random.normal(jax.random.PRNGKey(3), (4, 12))
    idx = vqa.ATT_MODULES.index("_Transform")

    def loss(params, in0):
        pre, pre_step = vqa.precompute(params, image_feat, word_vecs)
        pre_t = {"txt_tfm": pre_step["txt_tfm"][0]}
        att_b, _ = vqa.make_branches(params)
        out = att_b[idx](pre, pre_t, in0, None, 0)
        return jnp.sum(out ** 2), out

    (ref_l, ref_out), ref_g = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(params, in0)
    monkeypatch.setattr(common, "USE_FUSED_FSP", True)
    (fus_l, fus_out), fus_g = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(params, in0)

    np.testing.assert_allclose(np.asarray(fus_out), np.asarray(ref_out),
                               rtol=2e-5, atol=2e-5)
    for a, r in zip(jax.tree.leaves(fus_g), jax.tree.leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_fused_fsp_training_trace_gate(monkeypatch):
    """"auto" resolves on for inference traces on TPU, off inside
    training_trace() (measured 50% training slowdown from the custom-VJP
    fusion boundary); explicit "1" overrides the training gate."""
    from n2nmn_tpu.models.modules import common
    from n2nmn_tpu.ops.pallas import kernels

    monkeypatch.setattr(common, "USE_FUSED_FSP", "auto")
    monkeypatch.setattr(kernels, "_interpret_mode", lambda: False)
    assert common.fused_fsp_active()
    with common.training_trace():
        assert not common.fused_fsp_active()
        monkeypatch.setattr(common, "USE_FUSED_FSP", "1")
        assert common.fused_fsp_active()
        monkeypatch.setattr(common, "USE_FUSED_FSP", "auto")
        with common.training_trace(False):   # nested eval re-enable
            assert common.fused_fsp_active()
        assert not common.fused_fsp_active()
    assert common.fused_fsp_active()
    monkeypatch.setattr(kernels, "_interpret_mode", lambda: True)
    assert not common.fused_fsp_active()     # CPU: interpret mode loses


def test_quantize_grid_roundtrip():
    """q * scale reconstructs x within half an int8 step of each
    per-sample per-channel absmax."""
    from n2nmn_tpu.ops.pallas.kernels import quantize_grid

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 20, 16)) * 5.0
    q, scale = quantize_grid(x)
    assert q.dtype == jnp.int8 and scale.shape == (3, 16)
    recon = q.astype(jnp.float32) * scale[:, None, :]
    amax = np.max(np.abs(np.asarray(x)), axis=1)          # [N, D]
    bound = np.broadcast_to((amax / 127.0)[:, None, :] * 0.5 + 1e-6,
                            x.shape)
    np.testing.assert_array_less(np.abs(np.asarray(recon) - np.asarray(x)),
                                 bound)


@pytest.mark.parametrize("k", [1, 2])
def test_fused_readout_q_forward(k):
    """int8 readout == XLA softmax-readout over the dequantized grid."""
    from n2nmn_tpu.ops.pallas.kernels import quantize_grid, fused_readout_q

    key = jax.random.PRNGKey(4)
    k1, k2 = jax.random.split(key)
    att = jax.random.normal(k1, (3, k, 20))
    img = jax.random.normal(k2, (3, 20, 16)) * 3.0
    q, scale = quantize_grid(img)
    out = fused_readout_q(att, q, scale, jnp.float32)
    deq = q.astype(jnp.float32) * scale[:, None, :]
    ref = jnp.stack([ref_readout(att[:, i], deq) for i in range(k)], axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_find_q_forward():
    """int8 find == fused_find over the dequantized grid, with the scale
    folded into the text modulation (q*s ⊙ txt == q ⊙ (s*txt))."""
    from n2nmn_tpu.ops.pallas.kernels import quantize_grid, fused_find_q

    key = jax.random.PRNGKey(5)
    k1, k2, k3 = jax.random.split(key, 3)
    img = jax.random.normal(k1, (3, 20, 16)) * 2.0
    txt = jax.random.normal(k2, (3, 16))
    w = jax.random.normal(k3, (16,))
    b = jnp.float32(0.25)
    q, scale = quantize_grid(img)
    out = fused_find_q(q, txt * scale, w, b, jnp.float32)
    deq = q.astype(jnp.float32) * scale[:, None, :]
    ref = ref_find(deq, txt, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("flavor", ["clevr", "vqa"])
def test_grid_int8_branches_match_xla(flavor, monkeypatch):
    """GRID_INT8 end-to-end through the module branches: the int8 readout
    and find paths must match the f32 XLA paths within quantization error
    (grids scaled so per-channel error stays ~0.4% of absmax)."""
    from n2nmn_tpu.models.modules import clevr, vqa, common

    image_feat = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 4, 6))
    word_vecs = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 5))
    in0 = jax.random.normal(jax.random.PRNGKey(3), (4, 12))
    in1 = jax.random.normal(jax.random.PRNGKey(6), (4, 12))
    if flavor == "clevr":
        mod = clevr
        params = clevr.init_params(jax.random.PRNGKey(0), 6, 5, 3, hw=12)
        idx = clevr.ATT_MODULES.index("_FindSameProperty")
        txt_key = "txt_fsp"
    else:
        mod = vqa
        params = vqa.init_params(jax.random.PRNGKey(0), 6, 5, 3, map_dim=8)
        idx = vqa.ATT_MODULES.index("_Transform")
        txt_key = "txt_tfm"

    def run(pre_extra=()):
        pre, pre_step = mod.precompute(params, image_feat, word_vecs)
        pre_t = {txt_key: pre_step[txt_key][0]}
        pre_t.update(mod.make_step_shared(params)(pre, pre_t, in0, in1, 0))
        att_b, _ = mod.make_branches(params)
        return pre_t["readout0"], att_b[idx](pre, pre_t, in0, in1, 0)

    ro_ref, out_ref = run()
    monkeypatch.setattr(common, "GRID_INT8", "1")
    ro_q, out_q = run()
    np.testing.assert_allclose(np.asarray(ro_q), np.asarray(ro_ref),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_ref),
                               rtol=2e-2, atol=2e-2)


def test_quantize_grid_axis0_bound():
    """axis=0 quantization (decoder enc-tensors, [T, N, D]) keeps every
    element within amax/254 of the original (symmetric int8 step/2)."""
    from n2nmn_tpu.ops.pallas.kernels import quantize_grid

    x = jax.random.normal(jax.random.PRNGKey(7), (9, 4, 16)) * 3.0
    q, scale = quantize_grid(x, axis=0)
    assert q.shape == x.shape and scale.shape == (4, 16)
    deq = q.astype(jnp.float32) * scale[None]
    amax = jnp.max(jnp.abs(x), axis=0)
    err = jnp.max(jnp.abs(deq - x), axis=0)
    assert np.all(np.asarray(err) <= np.asarray(amax) / 254.0 + 1e-7)


def test_enc_int8_decode_matches_f32(monkeypatch):
    """ENC_INT8 serving mode: greedy decode over int8-quantized encoder
    tensors matches the f32 path's tokens/attention within quantization
    error (trained-snapshot equivalence runs on-chip via
    tools/bf16_check.py --enc_int8)."""
    from n2nmn_tpu.layout.grammar import ModuleGrammar
    from n2nmn_tpu.models.modules import common
    from n2nmn_tpu.models.netgen import (NetgenConfig, init_netgen,
                                         make_grammar_arrays, run_netgen)

    vocab = ["_Scene", "_Find", "_Transform", "_And", "_Exist", "_Count",
             "_Describe", "<eos>"]
    grammar = ModuleGrammar(vocab)
    cfg = NetgenConfig(
        num_vocab_txt=30, embed_dim_txt=16,
        num_vocab_nmn=grammar.num_vocab, embed_dim_nmn=16,
        lstm_dim=32, num_layers=2, T_decoder=8,
        decoder_sampling=False, mask_mode="grammar")
    params = init_netgen(jax.random.PRNGKey(0), cfg)
    arrays = make_grammar_arrays(grammar, 8)
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(0, 30, size=(10, 8)), jnp.int32)
    lengths = jnp.asarray(rng.randint(3, 11, size=8), jnp.int32)

    base = run_netgen(params, cfg, arrays, text, lengths,
                      jax.random.PRNGKey(1))
    monkeypatch.setattr(common, "ENC_INT8", "1")
    quant = run_netgen(params, cfg, arrays, text, lengths,
                       jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(quant.tokens),
                                  np.asarray(base.tokens))
    np.testing.assert_allclose(np.asarray(quant.atts),
                               np.asarray(base.atts), atol=2e-2)
    np.testing.assert_allclose(np.asarray(quant.token_probs),
                               np.asarray(base.token_probs), atol=2e-2)


def test_enc_int8_gate(monkeypatch):
    """ENC_INT8 "auto" mirrors GRID_INT8: inference-on-TPU only."""
    from n2nmn_tpu.models.modules import common
    from n2nmn_tpu.ops.pallas import kernels

    monkeypatch.setattr(common, "ENC_INT8", "auto")
    monkeypatch.setattr(kernels, "_interpret_mode", lambda: False)
    assert common.enc_int8_active()
    with common.training_trace():
        assert not common.enc_int8_active()
    monkeypatch.setattr(kernels, "_interpret_mode", lambda: True)
    assert not common.enc_int8_active()
    monkeypatch.setattr(common, "ENC_INT8", "0")
    monkeypatch.setattr(kernels, "_interpret_mode", lambda: False)
    assert not common.enc_int8_active()


def test_grid_int8_gate(monkeypatch):
    """"auto" = on for inference traces on real TPU, off under
    training_trace() and on CPU; explicit "1"/"0" override."""
    from n2nmn_tpu.models.modules import common
    from n2nmn_tpu.ops.pallas import kernels

    monkeypatch.setattr(common, "GRID_INT8", "auto")
    monkeypatch.setattr(kernels, "_interpret_mode", lambda: False)
    assert common.grid_int8_active()
    with common.training_trace():
        assert not common.grid_int8_active()
        monkeypatch.setattr(common, "GRID_INT8", "1")
        assert common.grid_int8_active()
    monkeypatch.setattr(common, "GRID_INT8", "auto")
    monkeypatch.setattr(kernels, "_interpret_mode", lambda: True)
    assert not common.grid_int8_active()
    monkeypatch.setattr(common, "GRID_INT8", "0")
    monkeypatch.setattr(kernels, "_interpret_mode", lambda: False)
    assert not common.grid_int8_active()


def test_fused_readout_grads():
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    att = jax.random.normal(k1, (3, 12))
    img = jax.random.normal(k2, (3, 12, 8))

    def loss_p(att, img):
        return jnp.sum(fused_readout(att, img) ** 3)

    def loss_r(att, img):
        return jnp.sum(ref_readout(att, img) ** 3)

    gp = jax.grad(loss_p, argnums=(0, 1))(att, img)
    gr = jax.grad(loss_r, argnums=(0, 1))(att, img)
    for a, r in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_no_gather_inside_kernels():
    """Mosaic rejects in-kernel gathers ("Only 2D gather is supported"),
    but CPU interpret mode happily runs them — so a kernel can pass every
    CPU test and still fail TPU lowering (round 3: integer indexing
    `s[:, i]` in the int8 readout). Walk every pallas_call's kernel
    jaxpr in representative calls and assert no gather snuck in."""
    from n2nmn_tpu.ops.pallas.kernels import (
        fused_find, fused_find_q, fused_readout, fused_readout_q,
        quantize_grid)

    def kernel_prims(fn, *args):
        jx = jax.make_jaxpr(fn)(*args)
        prims = set()

        def walk(j):
            for eqn in j.eqns:
                if eqn.primitive.name == "pallas_call":
                    prims.update(e.primitive.name
                                 for e in eqn.params["jaxpr"].eqns)
                for v in eqn.params.values():
                    if hasattr(v, "jaxpr") and hasattr(v.jaxpr, "eqns"):
                        walk(v.jaxpr)
                    elif hasattr(v, "eqns"):
                        walk(v)
        walk(jx.jaxpr)
        assert prims, "no pallas_call found"
        return prims

    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (3, 20, 16))
    att2 = jax.random.normal(key, (3, 2, 20))
    att1 = jax.random.normal(key, (3, 20))
    txt = jax.random.normal(key, (3, 16))
    w = jax.random.normal(key, (16,))
    b = jnp.float32(0.1)
    q, scale = quantize_grid(img)

    for prims in (
        kernel_prims(lambda a, i: fused_readout(a, i), att1, img),
        kernel_prims(lambda a: fused_readout_q(a, q, scale, jnp.float32),
                     att2),
        kernel_prims(lambda t: fused_find(img, t, w, b), txt),
        kernel_prims(lambda t: fused_find_q(q, t, w, b, jnp.float32),
                     txt),
    ):
        assert "gather" not in prims, prims
