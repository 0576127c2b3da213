"""End-to-end --from_images driver path: raw image .npy files -> in-graph
VGG pool5 -> modules, through the standard CLEVR train/evaluate
experiment drivers (the reference instead dumps 29 GB of pool5 features
offline, exp_clevr/data/extract_visual_features_vgg_pool5.py +
README.md:57)."""

import dataclasses
import os

import numpy as np
import pytest

CLEVR_VOCAB = ["_Scene", "_Find", "_Filter", "_FindSameProperty",
               "_Transform", "_And", "_Or", "_Exist", "_Count",
               "_EqualNum", "_MoreNum", "_LessNum", "_SameProperty",
               "_Describe", "<eos>"]


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("clevr_imgs")
    data = root / "data"
    imdb_dir = data / "imdb"
    img_dir = root / "images"
    for d in (data, imdb_dir, img_dir):
        os.makedirs(d, exist_ok=True)
    (data / "vocabulary_layout.txt").write_text(
        "\n".join(CLEVR_VOCAB) + "\n")
    (data / "vocabulary_clevr.txt").write_text(
        "\n".join(["<unk>", "is", "there", "a", "red", "cube"]) + "\n")
    (data / "answers_clevr.txt").write_text("\n".join(["yes", "no"]) + "\n")

    rng = np.random.RandomState(0)
    recs = []
    for i in range(6):
        path = str(img_dir / f"im{i}.npy")
        # raw 64x96 BGR 0-255 "image" (VGG stride 32 -> 2x3 module grid)
        np.save(path, rng.uniform(0, 255, size=(64, 96, 3))
                .astype(np.float32))
        recs.append({
            "question_tokens": ["is", "there", "a", "red", "cube"],
            "image_path": path,
            "answer": ["yes", "no"][i % 2],
            "gt_layout_tokens": ["_Scene", "_Exist"],
        })
    imdb = np.array(recs, dtype=object)
    np.save(str(imdb_dir / "imdb_trn.npy"), imdb)
    np.save(str(imdb_dir / "imdb_tst.npy"), imdb)
    return str(root)


def _tiny_cfg(image_root, **kw):
    from n2nmn_tpu.experiments import clevr
    return dataclasses.replace(
        clevr.ClevrConfig(
            exp_name="from_images_test", root=image_root,
            from_images=True, image_H=64, image_W=96,
            N=3, T_encoder=8, T_decoder=5,
            lstm_dim=32, embed_dim_txt=16, embed_dim_nmn=16,
            max_iter=2, snapshot_interval=2, log_interval=1),
        **kw)


def test_from_images_train_and_eval(image_root):
    from n2nmn_tpu.experiments import clevr

    cfg = _tiny_cfg(image_root)
    state = clevr.train(cfg)
    # frozen backbone contract: the VGG weights must be untouched by both
    # gradients and weight decay after training steps
    import jax
    params0 = clevr.build_model(cfg, sampling=True)[0].init(
        jax.random.PRNGKey(cfg.seed))
    for k in params0["vgg"]:
        np.testing.assert_array_equal(
            np.asarray(state.params["vgg"][k]["w"]),
            np.asarray(params0["vgg"][k]["w"]))

    res = clevr.evaluate(cfg, "from_images_test", "00000002", "tst",
                         T_decoder=5)
    assert res["num_questions"] == 6
    assert 0.0 <= res["answer_accuracy"] <= 1.0
    # cloning on ["_Scene", "_Exist"] for 2 iters should at least emit
    # mostly valid programs at eval; just require the field exists
    assert "layout_validity" in res


def test_vqa_in_graph_resnet_forward_and_frozen():
    """VQA image->answer path: raw RGB [0,1] -> in-graph ResNet-152 res5c
    -> modules, one program; the frozen backbone must receive zero grads
    and be excluded from L2 decay (reference consumes a 307 GB offline
    res5c dump — the backbone is not trainable there either)."""
    import jax
    import jax.numpy as jnp
    from n2nmn_tpu.layout.grammar import ModuleGrammar
    from n2nmn_tpu.models.netgen import NetgenConfig
    from n2nmn_tpu.models.nmn import NMNConfig, NMNModel
    from n2nmn_tpu.train.steps import _l2_for_decay

    grammar = ModuleGrammar(["_Find", "_Transform", "_And", "_Describe",
                             "<eos>"])
    net_cfg = NetgenConfig(
        num_vocab_txt=10, embed_dim_txt=8, num_vocab_nmn=grammar.num_vocab,
        embed_dim_nmn=8, lstm_dim=16, num_layers=1, T_decoder=4,
        decoder_sampling=False, mask_mode="grammar")
    cfg = NMNConfig(flavor="vqa", netgen=net_cfg, num_choices=5,
                    H_feat=2, W_feat=2, D_feat=2048, in_graph_resnet=True)
    model = NMNModel(cfg, grammar)
    params = model.init(jax.random.PRNGKey(0))
    assert "resnet" in params

    n = 2
    key = jax.random.PRNGKey(1)
    text = jax.random.randint(key, (6, n), 0, 10, jnp.int32)
    seq_len = jnp.full((n,), 6, jnp.int32)
    images = jax.random.uniform(key, (n, 64, 64, 3))  # 64/32 -> 2x2 grid

    def loss(p):
        out = model.apply(p, text, seq_len, images, jax.random.PRNGKey(2),
                          use_gt_layout=False, deterministic=True)
        return jnp.sum(out.scores ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    # frozen: every resnet grad exactly zero
    for g in jax.tree_util.tree_leaves(grads["resnet"]):
        np.testing.assert_array_equal(np.asarray(g), 0.0)
    # and excluded from weight decay: decay over the full tree equals
    # decay with the resnet subtree dropped (resnet params also use raw
    # conv arrays, not 'w' leaves, so they are doubly outside the
    # reference's *weights L2 filter)
    from n2nmn_tpu.ops.nn import l2_of_weights
    l2_frozen = _l2_for_decay(model, params)
    l2_without = l2_of_weights({k: v for k, v in params.items()
                                if k != "resnet"})
    np.testing.assert_allclose(float(l2_frozen), float(l2_without))


def test_raw_image_source_color_conventions(tmp_path):
    from PIL import Image
    from n2nmn_tpu.data.imdb import RawImageSource

    # PNG in RGB: red-ish pixel -> BGR order flips channel 0 and 2
    arr = np.zeros((4, 4, 3), np.uint8)
    arr[..., 0] = 200  # R
    arr[..., 2] = 50   # B
    png = tmp_path / "im.png"
    Image.fromarray(arr).save(png)
    src = RawImageSource(None, (4, 4))
    out = np.zeros((1, 4, 4, 3), np.float32)
    src.get_batch([{"image_path": str(png)}], out)
    assert np.all(out[0, :, :, 0] == 50)    # B first
    assert np.all(out[0, :, :, 2] == 200)   # R last

    # rgb01 (ResNet convention): RGB order, scaled to [0, 1]
    src01 = RawImageSource(None, (4, 4), color="rgb01")
    out01 = np.zeros((1, 4, 4, 3), np.float32)
    src01.get_batch([{"image_path": str(png)}], out01)
    np.testing.assert_allclose(out01[0, :, :, 0], 200 / 255.0, rtol=1e-6)
    np.testing.assert_allclose(out01[0, :, :, 2], 50 / 255.0, rtol=1e-6)

    # .npy passes through when the size matches; mismatch raises
    ok = tmp_path / "ok.npy"
    np.save(ok, np.full((4, 4, 3), 100.0, np.float32))
    out2 = np.zeros((1, 4, 4, 3), np.float32)
    src.get_batch([{"image_path": str(ok)}], out2)
    np.testing.assert_allclose(out2, 100.0)
    bad = tmp_path / "bad.npy"
    np.save(bad, np.full((8, 8, 3), 100.0, np.float32))
    with pytest.raises(ValueError):
        src.get_batch([{"image_path": str(bad)}], out2)


def test_extension_flags_reach_model(image_root):
    """Regression: every ClevrConfig framework-extension flag must reach
    NMNConfig through build_model (count_mlp_ext was once accepted by
    the CLI but silently dropped here, so --count_mlp_ext trained a
    parity Count head)."""
    import jax
    from n2nmn_tpu.experiments import clevr

    cfg = _tiny_cfg(image_root, scene_ext=True, scene_bounded=True,
                    num_mlp_ext=True, count_mlp_ext=True)
    for from_images in (True, False):
        c = dataclasses.replace(cfg, from_images=from_images)
        model, _ = clevr.build_model(c, sampling=False)
        params = model.init(jax.random.PRNGKey(0))
        assert "scene_b" in params["modules"]
        assert "fc_hidden" in params["modules"]["count"]
        assert "fc_hidden" in params["modules"]["equal_num"]

    # num_res_ext (residual comparison heads) reaches the model too
    cfg_res = _tiny_cfg(image_root, num_res_ext=True)
    for from_images in (True, False):
        c = dataclasses.replace(cfg_res, from_images=from_images)
        model, _ = clevr.build_model(c, sampling=False)
        params = model.init(jax.random.PRNGKey(0))
        assert "fc_res" in params["modules"]["equal_num"]
