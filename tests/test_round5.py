"""Round-5 surface: strict partial-restore errors, extension-flag
validation, the flagship VQA builder, the VQA device-resident trainer,
evaluate_many sweeps, and the layout-shift analyzer."""

import os

import numpy as np
import pytest

from n2nmn_tpu.train.checkpoint import load_params, save_params


def test_load_params_errors_on_missing_template_keys(tmp_path):
    # ADVICE r4 medium: silently keeping a fresh init for template keys
    # absent from the checkpoint runs untrained heads (e.g. --scene_ext
    # eval of a parity snapshot)
    small = {"a": {"w": np.ones((2, 2))}}
    big = {"a": {"w": np.zeros((2, 2))},
           "scene": {"w": np.zeros((3,))}}
    path = os.path.join(tmp_path, "snap")
    save_params(path, small)
    with pytest.raises(KeyError, match="scene/w"):
        load_params(path, big)
    # explicit opt-outs restore partially
    p, _ = load_params(path, big, allow_missing=("scene/",))
    assert np.all(np.asarray(p["a"]["w"]) == 1)
    assert np.all(np.asarray(p["scene"]["w"]) == 0)
    p, _ = load_params(path, big, allow_missing=True)
    assert np.all(np.asarray(p["a"]["w"]) == 1)
    # exclude'd prefixes are implicitly allowed to stay at template init
    save_params(path, big)
    p, _ = load_params(path, big, exclude=("scene/",))
    assert np.all(np.asarray(p["a"]["w"]) == 0)


def test_nmn_config_rejects_silent_flag_combos():
    # ADVICE r4: scene_bounded w/o scene_ext is a no-op; num_mlp_ext and
    # num_res_ext are mutually exclusive heads
    from n2nmn_tpu.experiments import clevr

    with pytest.raises(ValueError, match="scene_ext"):
        clevr.build_model(clevr.ClevrConfig(scene_bounded=True),
                          sampling=False)
    with pytest.raises(ValueError, match="mutually"):
        clevr.build_model(clevr.ClevrConfig(num_mlp_ext=True,
                                            num_res_ext=True),
                          sampling=False)


@pytest.fixture(scope="module")
def vqa_flag_tiny(tmp_path_factory):
    from n2nmn_tpu.data.builders import mini_vqa

    root = str(tmp_path_factory.mktemp("vqa_flag_tiny"))
    mini_vqa.generate(root, num_train=24, num_val=8, num_test=8,
                      flagship=True, seed=0)
    return root


def test_mini_vqa_flagship_builder(vqa_flag_tiny):
    root = vqa_flag_tiny
    imdb = np.load(os.path.join(root, "data/imdb/imdb_trn.npy"),
                   allow_pickle=True)
    assert len(imdb) == 24
    feat = np.load(imdb[0]["feature_path"])
    assert feat.shape == (1, 14, 14, 2048)      # real res5c geometry
    assert (feat >= 0).all()                    # post-ReLU like res5c
    vocab = [l for l in open(os.path.join(
        root, "data/vocabulary_vqa.txt")).read().split("\n") if l]
    answers = [l for l in open(os.path.join(
        root, "data/answers_vqa.txt")).read().split("\n") if l]
    assert len(vocab) == 17742 and len(answers) == 3001   # real lists
    assert answers[0] == "<unk>"
    glove = np.load(os.path.join(root, "data/vocabulary_vqa_glove.npy"))
    assert glove.shape == (17742, 300)
    # scenes are shared across questions (fingerprint lesson)
    n_imgs = len({r["image_name"] for r in imdb})
    assert n_imgs <= len(imdb) // 3
    # answers come from the real 3001 list (junk maps to <unk>)
    aset = set(answers)
    for r in imdb:
        assert all(a in aset for a in r["valid_answers"])


def test_vqa_device_resident_matches_streaming_smoke(tmp_path):
    # the device-resident trainer must run cloning + rl end to end and
    # write loadable snapshots (answer sampling moves on-device)
    import jax
    from n2nmn_tpu.data.builders import mini_vqa
    from n2nmn_tpu.experiments import vqa

    root = str(tmp_path / "mini")
    mini_vqa.generate(root, num_train=48, num_val=16, num_test=16, seed=1)
    cfg = vqa.VqaConfig(exp_name="devres", root=root,
                        imdb_trn="data/imdb/imdb_trn.npy", N=8,
                        max_iter=3, log_interval=1, snapshot_interval=3,
                        chunk_steps=2, device_data_bf16=True)
    state = vqa.train(cfg)
    assert int(state.step) == 3
    snap = os.path.join(root, "tfmodel", "devres", "00000003")
    assert os.path.exists(snap + ".npz")
    rl = vqa.rl_config(exp_name="devres_rl", root=root,
                       imdb_trn="data/imdb/imdb_trn.npy", N=8,
                       max_iter=2, log_interval=1, snapshot_interval=2,
                       chunk_steps=2, device_data_bf16=True)
    state = vqa.train(rl, pretrained_model=snap)
    assert int(state.step) == 2
    res = vqa.evaluate(cfg, "devres", "00000003", "val", batch_size=8)
    assert 0.0 <= res["answer_accuracy"] <= 1.0


def test_evaluate_many_sweep_and_layout_dump(tmp_path):
    # evaluate_many over two snapshots == two evaluate calls, plus the
    # layouts npz consumed by tools/layout_shift.py
    import jax
    from n2nmn_tpu.data.builders import mini_clevr
    from n2nmn_tpu.experiments import clevr
    from n2nmn_tpu.tools.layout_shift import analyze

    root = str(tmp_path / "mini")
    mini_clevr.generate(root, num_train=32, num_val=16, num_test=16)
    cfg = clevr.ClevrConfig(root=root, N=8, max_iter=2, log_interval=1,
                            snapshot_interval=1,
                            imdb_trn="data/imdb/imdb_trn.npy")
    clevr.train(cfg)
    exp = cfg.exp_name
    snaps = ["00000001", "00000002"]
    many = clevr.evaluate_many(cfg, exp, snaps, "val", dump_layouts=True)
    for s in snaps:
        one = clevr.evaluate(cfg, exp, s, "val")
        assert one == many[s]
        npz = os.path.join(root, "results", exp, f"{s}.val.layouts.npz")
        assert os.path.exists(npz)
        rep = analyze(npz)
        assert rep["num_questions"] == 16
        assert 0.0 <= rep["layout_accuracy"] <= 1.0
        # transitions cover exactly the shifted questions
        assert sum(t["count"] for t in rep["transitions"]) == round(
            (1 - rep["layout_accuracy"]) * rep["num_questions"])
