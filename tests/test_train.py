"""Training-layer tests: optimizer clipping semantics, checkpoint
partial restore, cloning/RL step integration on a tiny SHAPES model,
chunked-trainer equivalence, augmentation invariants, and the dp-sharded
multi-device step."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from n2nmn_tpu.layout.grammar import ModuleGrammar
from n2nmn_tpu.models.netgen import NetgenConfig
from n2nmn_tpu.models.nmn import NMNConfig, NMNModel
from n2nmn_tpu.train.optim import make_optimizer, clip_each_by_norm
from n2nmn_tpu.train.steps import (
    create_train_state, make_cloning_step, make_rl_step,
    cloning_step_body, make_chunked_trainer)
from n2nmn_tpu.train.checkpoint import save_params, load_params

SHAPES_VOCAB = ["_Find", "_Transform", "_And", "_Answer", "<eos>"]


def tiny_model(sampling=True, mask_mode="eos_force", T_dec=7):
    grammar = ModuleGrammar(SHAPES_VOCAB)
    net_cfg = NetgenConfig(
        num_vocab_txt=14, embed_dim_txt=12, num_vocab_nmn=grammar.num_vocab,
        embed_dim_nmn=12, lstm_dim=16, num_layers=2, T_decoder=T_dec,
        decoder_sampling=sampling, mask_mode=mask_mode)
    cfg = NMNConfig(flavor="shapes", netgen=net_cfg, num_choices=2,
                    H_feat=3, W_feat=3, D_feat=8, in_graph_cnn=False)
    return NMNModel(cfg, grammar), grammar


def tiny_batch(N=8, T_enc=6, T_dec=7, grammar=None, seed=0):
    rng = np.random.RandomState(seed)
    gt = np.full((T_dec, N), grammar.eos_idx, np.int32)
    gt[0] = grammar.name2idx["_Find"]
    gt[1] = grammar.name2idx["_Answer"]
    return {
        "text_seq": rng.randint(0, 14, size=(T_enc, N)).astype(np.int32),
        "seq_length": np.full(N, T_enc, np.int32),
        "image": rng.randn(N, 3, 3, 8).astype(np.float32),
        "label": rng.randint(0, 2, size=N).astype(np.int32),
        "weight": np.ones(N, np.float32),
        "gt_layout": gt,
    }


def test_clip_each_by_norm_matches_tf_semantics():
    tx = clip_each_by_norm(2.0)
    big = jnp.ones((4,)) * 10.0        # norm 20 -> scaled to norm 2
    small = jnp.ones((4,)) * 0.1       # norm 0.2 -> untouched
    updates, _ = tx.update({"a": big, "b": small}, tx.init(None))
    np.testing.assert_allclose(
        float(jnp.linalg.norm(updates["a"])), 2.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["b"]),
                               np.asarray(small), rtol=1e-6)


def test_checkpoint_roundtrip_and_partial_restore(tmp_path):
    model, grammar = tiny_model()
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "snap")
    save_params(path, params, extra={"baseline": np.float32(1.5)})
    template = model.init(jax.random.PRNGKey(42))  # different values
    restored, extra = load_params(path, template)
    np.testing.assert_allclose(
        np.asarray(restored["modules"]["find"]["conv_image"]["w"]),
        np.asarray(params["modules"]["find"]["conv_image"]["w"]))
    assert float(extra["baseline"]) == 1.5
    # partial restore: keep the template's encoder embedding
    restored2, _ = load_params(path, template,
                               exclude=("netgen/encoder/embedding",))
    np.testing.assert_allclose(
        np.asarray(restored2["netgen"]["encoder"]["embedding"]["table"]),
        np.asarray(template["netgen"]["encoder"]["embedding"]["table"]))


def test_cloning_step_reduces_loss():
    model, grammar = tiny_model(sampling=True)
    batch = tiny_batch(grammar=grammar)
    tx = make_optimizer(1e-2, 10.0)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), tx,
                               jax.random.PRNGKey(1))
    step = make_cloning_step(model, tx, weight_decay=0.0,
                             dropout_training=False)
    losses = []
    for _ in range(15):
        state, aux = step(state, batch)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_cloning_step_txtatt_supervision():
    # optional gt-text-attention loss (reference vqa_train/
    # data_reader.py:25-27 spans; wired via txtatt_loss_weight)
    model, grammar = tiny_model(sampling=True)
    batch = tiny_batch(grammar=grammar)
    T_dec, T_enc, N = 7, 6, 8
    rng = np.random.RandomState(3)
    gt_att = np.zeros((T_dec, T_enc, N), bool)
    # supervise the first two decoder steps on a random word each
    for t in range(2):
        for n in range(N):
            gt_att[t, rng.randint(T_enc), n] = True
    batch["gt_txtatt"] = gt_att
    tx = make_optimizer(1e-2, 10.0)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), tx,
                               jax.random.PRNGKey(1))
    step = make_cloning_step(model, tx, weight_decay=0.0,
                             dropout_training=False,
                             txtatt_loss_weight=1.0)
    att_losses = []
    for _ in range(20):
        state, aux = step(state, batch)
        att_losses.append(float(aux["txtatt_loss"]))
    assert np.isfinite(att_losses).all()
    # supervision must actually pull attention onto the gt spans
    assert att_losses[-1] < att_losses[0]
    # weight 0 keeps the old aux surface (no txtatt key)
    step0 = make_cloning_step(model, tx, weight_decay=0.0,
                              dropout_training=False)
    _, aux0 = step0(state, {k: v for k, v in batch.items()
                            if k != "gt_txtatt"})
    assert "txtatt_loss" not in aux0


def test_rl_step_updates_baseline_and_stays_finite():
    # grammar mode guarantees valid layouts -> loss = xent != baseline
    model, grammar = tiny_model(sampling=True, mask_mode="grammar")
    batch = tiny_batch(grammar=grammar)
    batch.pop("gt_layout")
    tx = make_optimizer(1e-3, 10.0)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), tx,
                               jax.random.PRNGKey(1), baseline_init=3.0)
    step = make_rl_step(model, tx, weight_decay=0.0, lambda_entropy=0.5,
                        invalid_expr_loss=3.0, dropout_training=False)
    b0 = float(state.baseline)
    for _ in range(5):
        state, aux = step(state, batch)
        assert np.isfinite(float(aux["loss"]))
    assert float(state.baseline) != b0


def test_chunked_trainer_matches_loop():
    """K steps through the chunked scan == K sequential body calls."""
    model, grammar = tiny_model(sampling=False)
    tx = make_optimizer(1e-2, 10.0)
    body = cloning_step_body(model, tx, weight_decay=0.0,
                             dropout_training=False)
    batches = [tiny_batch(grammar=grammar, seed=s) for s in range(3)]
    data = {k: jnp.asarray(np.stack([b[k] for b in batches]))
            for k in batches[0]}

    state0 = create_train_state(model.init(jax.random.PRNGKey(0)), tx,
                                jax.random.PRNGKey(1))
    chunk = make_chunked_trainer(body, data, num_batches=3,
                                 steps_per_call=4)
    state_c, auxs = chunk(state0, jnp.asarray(0))

    state_l = create_train_state(model.init(jax.random.PRNGKey(0)), tx,
                                 jax.random.PRNGKey(1))
    jbody = jax.jit(body)
    for k in range(4):
        state_l, aux_l = jbody(state_l, batches[k % 3])
        np.testing.assert_allclose(float(auxs["loss"][k]),
                                   float(aux_l["loss"]), rtol=2e-4,
                                   atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state_c.params["modules"]["find"]["fc_text"]["w"]),
        np.asarray(state_l.params["modules"]["find"]["fc_text"]["w"]),
        rtol=2e-4, atol=1e-5)


def test_dp_sharded_step_runs_on_mesh():
    """Full cloning step under dp sharding on the 8-device CPU mesh."""
    from n2nmn_tpu.parallel.mesh import make_mesh, shard_batch, replicate
    model, grammar = tiny_model(sampling=False)
    mesh = make_mesh(n_dp=4, n_tp=2)
    batch = tiny_batch(N=16, grammar=grammar)
    tx = make_optimizer(1e-2, 10.0)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), tx,
                               jax.random.PRNGKey(1))
    state = jax.tree_util.tree_map(
        lambda x: replicate(x, mesh), state)
    sharded = shard_batch(batch, mesh)
    step = make_cloning_step(model, tx, weight_decay=0.0,
                             dropout_training=False)
    state, aux = step(state, sharded)
    assert np.isfinite(float(aux["loss"]))

    # dp result must equal single-device result
    state1 = create_train_state(model.init(jax.random.PRNGKey(0)), tx,
                                jax.random.PRNGKey(1))
    _, aux1 = step(state1, batch)
    np.testing.assert_allclose(float(aux["loss"]), float(aux1["loss"]),
                               rtol=2e-4)


def test_augmentation_label_preserving_structure():
    from n2nmn_tpu.data.shapes import ShapesData, augment_shapes_data
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    vocab_file = os.path.join(REPO, "exp_shapes/data/vocabulary_shape.txt")
    with open(vocab_file) as f:
        vocab = [l.strip() for l in f]
    w2i = {w: i for i, w in enumerate(vocab)}
    rng = np.random.RandomState(0)
    q = 5
    words = ["is", "a", "red", "shape", "left", "of", "a", "green",
             "shape"]
    text = np.zeros((15, q), np.int32)
    for n in range(q):
        for t, w in enumerate(words):
            text[t, n] = w2i[w]
    data = ShapesData(
        text_seq=text, seq_length=np.full(q, len(words), np.int32),
        images=rng.rand(q, 30, 30, 3).astype(np.float32),
        labels=rng.randint(0, 2, q).astype(np.int32),
        gt_layout=np.zeros((11, q), np.int32))
    aug = augment_shapes_data(data, vocab_file)
    assert aug.num_questions == q * 12
    # identity variant comes first: unchanged
    np.testing.assert_array_equal(aug.text_seq[:, :q], text)
    np.testing.assert_array_equal(aug.images[:q], data.images)
    # hflip variant: left -> right, image width reversed
    flip_block = aug.text_seq[:, q:2 * q]
    assert flip_block[4, 0] == w2i["right"]
    np.testing.assert_array_equal(aug.images[q:2 * q],
                                  data.images[:, :, ::-1, :])
    # labels/layouts replicated unchanged
    np.testing.assert_array_equal(aug.labels, np.tile(data.labels, 12))


def test_full_state_checkpoint_roundtrip(tmp_path):
    from n2nmn_tpu.train.checkpoint import (
        save_pytree, load_pytree, latest_snapshot)
    model, grammar = tiny_model(sampling=False)
    tx = make_optimizer(1e-2, 10.0)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), tx,
                               jax.random.PRNGKey(1))
    step = make_cloning_step(model, tx, weight_decay=0.0,
                             dropout_training=False)
    batch = tiny_batch(grammar=grammar)
    state, _ = step(state, batch)  # populate adam moments

    path = str(tmp_path / "00000020.state")
    save_pytree(path, state)
    template = create_train_state(model.init(jax.random.PRNGKey(9)), tx,
                                  jax.random.PRNGKey(2))
    restored = load_pytree(path, template)
    # params, optimizer moments, step and rng all roundtrip
    for a, b in zip(jax.tree_util.tree_leaves(restored),
                    jax.tree_util.tree_leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    found = latest_snapshot(str(tmp_path))
    assert found is not None and found[1] == 20


def test_scan_remat_preserves_gradients(monkeypatch):
    """N2NMN_SCAN_REMAT changes residual storage, not math: gradients of
    the cloning loss must match with rematerialization on and off."""
    from n2nmn_tpu.ops import nn as ops_nn
    from n2nmn_tpu.train.steps import _xent, _wmean

    model, grammar = tiny_model(sampling=False)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(grammar=grammar).items()}
    params = model.init(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(7)

    def loss_fn(p):
        out = model.apply(p, batch["text_seq"], batch["seq_length"],
                          batch["image"], rng, gt_layout=batch["gt_layout"],
                          use_gt_layout=True, deterministic=True)
        return (_wmean(-out.log_seq_prob, batch["weight"])
                + _wmean(_xent(out.scores, batch["label"]), batch["weight"]))

    grads = {}
    for remat in (False, True):
        monkeypatch.setattr(ops_nn, "SCAN_REMAT", remat)
        grads[remat] = jax.grad(loss_fn)(params)
    for a, b in zip(jax.tree_util.tree_leaves(grads[False]),
                    jax.tree_util.tree_leaves(grads[True])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_clevr_device_resident_trainer(tmp_path):
    """cfg.device_data: the CLEVR trainer stages the whole epoch in
    device memory and trains through the chunked scan — loss finite,
    snapshot written, metrics logged (the path flagship-geometry
    synthetic training uses to avoid per-step feature uploads)."""
    from n2nmn_tpu.data.builders import mini_clevr
    from n2nmn_tpu.experiments import clevr

    root = str(tmp_path)
    mini_clevr.generate(root, num_train=96, num_val=16, num_test=16,
                        seed=0)
    cfg = clevr.ClevrConfig(exp_name="dd", root=root, max_iter=4,
                            log_interval=2, snapshot_interval=4, N=16,
                            device_data=True)
    state = clevr.train(cfg)
    assert np.isfinite(float(state.baseline))
    assert os.path.exists(
        os.path.join(root, "tfmodel", "dd", "00000004.npz"))
    assert os.path.exists(os.path.join(root, "tb", "dd.jsonl"))


def test_clevr_device_resident_dedup_matches_per_question(tmp_path):
    """cfg.device_data_dedup: with several questions per image, images
    stage ONCE in a shared table gathered by per-question keys — the
    trained state must be IDENTICAL to per-question staging (pure
    memory-layout change)."""
    import dataclasses
    from n2nmn_tpu.data.builders import mini_clevr
    from n2nmn_tpu.experiments import clevr

    root = str(tmp_path)
    mini_clevr.generate(root, num_train=96, num_val=16, num_test=16,
                        seed=0, q_per_image=4)
    states = {}
    for dedup in (True, False):
        cfg = clevr.ClevrConfig(
            exp_name=f"dd_{dedup}", root=root, max_iter=4,
            log_interval=2, snapshot_interval=4, N=16,
            device_data=True, device_data_dedup=dedup)
        states[dedup] = clevr.train(cfg)
    for a, b in zip(jax.tree_util.tree_leaves(states[True].params),
                    jax.tree_util.tree_leaves(states[False].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
