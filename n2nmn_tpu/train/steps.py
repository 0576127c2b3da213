"""Jitted train/eval steps: behavioral cloning and REINFORCE policy search.

Loss semantics replicated from the reference drivers:
- cloning: mean softmax-xent on answers + mean(-log p(layout)) likelihood
  + weight_decay * l2 (exp_clevr/train_clevr_gt_layout.py:103-114).
- policy search (REINFORCE): per-sample loss is answer-xent for valid
  layouts and a constant ``invalid_expr_loss`` otherwise; surrogate is
  E[stop_grad(loss - baseline) * log p(layout)] with a scalar EMA baseline
  updated by (1-decay)*(batch_loss - baseline) after the gradient step
  (exp_shapes/train_shapes_scratch.py:142-163,
   exp_clevr/train_clevr_rl_gt_layout.py:107-129).

Every step is ONE device program: layout decode, assembly/validity, module
execution, loss, backward and the optimizer update all fuse under jit —
the reference needed two partial_run phases and a host assembler round-trip
per iteration (SURVEY.md §3.1).

Batches may be padded to a fixed size; ``weight`` (1 for real examples,
0 for padding) makes every mean a weighted mean so XLA sees static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from n2nmn_tpu.models.modules import common as modules_common
from n2nmn_tpu.ops.nn import l2_of_weights


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    baseline: jnp.ndarray       # scalar EMA baseline (REINFORCE)
    step: jnp.ndarray           # scalar int32
    rng: jnp.ndarray            # PRNG key threaded across steps


def create_train_state(params, tx, rng, baseline_init=0.0):
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        baseline=jnp.asarray(baseline_init, jnp.float32),
        step=jnp.asarray(0, jnp.int32),
        rng=rng,
    )


def _wmean(x, w):
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def _l2_for_decay(model, params):
    """L2 over trainable weights. A frozen in-graph backbone (VGG pool5 /
    ResNet res5c) is not a trainable variable in the reference (its
    features are dumped offline), so it is excluded from decay; SHAPES'
    in-graph convnet IS trained (models_shapes/nmn3_model.py) and stays
    included."""
    cfg = model.cfg
    if getattr(cfg, "freeze_backbone", True):
        frozen = {k for k, on in (("vgg", getattr(cfg, "in_graph_vgg",
                                                  False)),
                                  ("resnet", getattr(cfg, "in_graph_resnet",
                                                     False)))
                  if on and k in params}
        if frozen:
            params = {k: v for k, v in params.items() if k not in frozen}
    return l2_of_weights(params)


def _xent(scores, labels):
    logp = jax.nn.log_softmax(scores)
    return -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]


def cloning_step_body(model, tx, weight_decay: float,
                      dropout_training: bool = True,
                      txtatt_loss_weight: float = 0.0):
    """Un-jitted behavioral-cloning step body (state, batch) ->
    (state, aux). batch keys: text_seq [T,N], seq_length [N],
    image [N,...], gt_layout [Td,N], label [N], weight [N];
    optionally gt_txtatt [Td,Te,N] bool when txtatt_loss_weight > 0.

    txtatt_loss_weight wires the VQA readers' ground-truth text-attention
    spans (reference util/vqa_train/data_reader.py:25-27,133-138 builds
    gt_txtatt_batch, but no shipped reference driver consumes it) into an
    optional supervision term: -log of the decoder-attention mass on the
    gt span, averaged over the decoder steps that have one."""

    def loss_fn(params, batch, rng):
        with modules_common.training_trace():
            out = model.apply(
                params, batch["text_seq"], batch["seq_length"],
                batch["image"], rng, gt_layout=batch["gt_layout"],
                use_gt_layout=True, deterministic=not dropout_training)
        w = batch["weight"]
        xent = _xent(out.scores, batch["label"])
        avg_sample_loss = _wmean(xent, w)
        seq_likelihood_loss = _wmean(-out.log_seq_prob, w)
        total = (seq_likelihood_loss + avg_sample_loss
                 + weight_decay * _l2_for_decay(model, params))
        txtatt_loss = None
        if txtatt_loss_weight and "gt_txtatt" in batch:
            gt = batch["gt_txtatt"].astype(jnp.float32)     # [Td,Te,N]
            mass = jnp.sum(out.atts * gt, axis=1)           # [Td,N]
            has_gt = jnp.any(batch["gt_txtatt"], axis=1)    # [Td,N]
            nll = jnp.where(has_gt, -jnp.log(mass + 1e-8), 0.0)
            per_q = (jnp.sum(nll, axis=0)
                     / jnp.maximum(jnp.sum(has_gt, axis=0), 1))
            txtatt_loss = _wmean(per_q, w)
            total = total + txtatt_loss_weight * txtatt_loss
        pred = jnp.argmax(out.scores, axis=1)
        acc = _wmean(
            (jnp.logical_and(out.validity, pred == batch["label"]))
            .astype(jnp.float32), w)
        aux = {
            "loss": avg_sample_loss,
            "seq_likelihood_loss": seq_likelihood_loss,
            "accuracy": acc,
            "entropy": -_wmean(out.neg_entropy, w),
            "validity": _wmean(out.validity.astype(jnp.float32), w),
        }
        if txtatt_loss is not None:
            aux["txtatt_loss"] = txtatt_loss
        return total, aux

    def train_step(state: TrainState, batch):
        rng, step_rng = jax.random.split(state.rng)
        grads, aux = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, step_rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               baseline=state.baseline,
                               step=state.step + 1, rng=rng)
        return new_state, aux

    return train_step


def make_cloning_step(model, tx, weight_decay: float,
                      dropout_training: bool = True,
                      txtatt_loss_weight: float = 0.0):
    return jax.jit(cloning_step_body(model, tx, weight_decay,
                                     dropout_training,
                                     txtatt_loss_weight))


def rl_step_body(model, tx, weight_decay: float, lambda_entropy: float,
                 invalid_expr_loss: float, baseline_decay: float = 0.99,
                 dropout_training: bool = True,
                 use_gt_layout: bool = False):
    """Un-jitted REINFORCE step body (scratch or rl-finetune)."""

    def loss_fn(params, batch, rng, baseline):
        with modules_common.training_trace():
            out = model.apply(
                params, batch["text_seq"], batch["seq_length"],
                batch["image"], rng,
                gt_layout=batch.get("gt_layout"),
                use_gt_layout=use_gt_layout,
                deterministic=not dropout_training)
        w = batch["weight"]
        xent = _xent(out.scores, batch["label"])
        final_loss = jnp.where(out.validity, xent, invalid_expr_loss)
        avg_sample_loss = _wmean(final_loss, w)
        policy_gradient_loss = _wmean(
            jax.lax.stop_gradient(final_loss - baseline)
            * out.log_seq_prob, w)
        entropy_reg = _wmean(out.neg_entropy, w)
        total = (policy_gradient_loss + avg_sample_loss
                 + lambda_entropy * entropy_reg
                 + weight_decay * _l2_for_decay(model, params))
        pred = jnp.argmax(out.scores, axis=1)
        acc = _wmean(
            jnp.logical_and(out.validity, pred == batch["label"])
            .astype(jnp.float32), w)
        aux = {
            "loss": avg_sample_loss,
            "accuracy": acc,
            "entropy": -entropy_reg,
            "validity": _wmean(out.validity.astype(jnp.float32), w),
        }
        return total, aux

    def train_step(state: TrainState, batch):
        rng, step_rng = jax.random.split(state.rng)
        grads, aux = jax.grad(loss_fn, has_aux=True)(
            state.params, batch, step_rng, state.baseline)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # EMA baseline update runs after the gradient uses the old value
        # (reference train_clevr_rl_gt_layout.py:119-124,144-145)
        baseline = state.baseline + (1.0 - baseline_decay) * (
            aux["loss"] - state.baseline)
        new_state = TrainState(params=params, opt_state=opt_state,
                               baseline=baseline,
                               step=state.step + 1, rng=rng)
        return new_state, aux

    return train_step


def make_rl_step(model, tx, weight_decay: float, lambda_entropy: float,
                 invalid_expr_loss: float, baseline_decay: float = 0.99,
                 dropout_training: bool = True,
                 use_gt_layout: bool = False):
    return jax.jit(rl_step_body(model, tx, weight_decay, lambda_entropy,
                                invalid_expr_loss, baseline_decay,
                                dropout_training, use_gt_layout))


def make_chunked_trainer(body, data_on_device, num_batches: int,
                         steps_per_call: int, shared_data=None):
    """Device-resident training driver: the whole (small) dataset lives on
    device as stacked per-batch arrays [B, ...]; one jitted call scans
    ``steps_per_call`` optimizer steps, indexing batch (start+k) % B —
    amortizing host dispatch to ~zero. This is how SHAPES-sized datasets
    should train on a TPU (the reference re-feeds host numpy slices every
    iteration, exp_shapes/train_shapes_gt_layout.py:195-219).

    body: un-jitted (state, batch) -> (state, aux).
    data_on_device: dict of arrays with leading batch-index axis [B, ...].
    The data is threaded through jit as an ARGUMENT (closing over large
    device arrays would inline them as MLIR constants — lowering then
    serializes the whole dataset).
    shared_data: optional dict of arrays with NO batch axis, merged into
    every step's batch unindexed (e.g. a deduplicated image table that
    per-question integer keys gather from — datasets with several
    questions per image stage each image once instead of per question).
    Returns fn(state, start_idx) -> (state, stacked aux [K])."""

    @jax.jit
    def run(state, start_idx, data, shared):
        def step(state, k):
            idx = jax.lax.rem(start_idx + k, num_batches)
            batch = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, idx, axis=0, keepdims=False), data)
            return body(state, {**batch, **shared})

        return jax.lax.scan(step, state, jnp.arange(steps_per_call))

    def runner(state, start_idx):
        return run(state, start_idx, data_on_device, shared_data or {})

    return runner


def drive_chunked_training(body, device_data, shared, state, cfg, logger,
                           snapshot_dir):
    """Drive make_chunked_trainer to cfg.max_iter with the reference's
    log/snapshot cadence (uses cfg.{chunk_steps, log_interval, max_iter,
    snapshot_interval}; shared by the CLEVR-flagship and VQA-flagship
    device-resident trainers)."""
    from n2nmn_tpu.train.checkpoint import save_params, snapshot_path

    B = next(iter(device_data.values())).shape[0]
    C = cfg.chunk_steps or max(cfg.log_interval, 200)
    L = cfg.log_interval
    chunk = make_chunked_trainer(body, device_data, B, C,
                                 shared_data=shared)
    chunk_last = None
    n_iter = 0
    while n_iter < cfg.max_iter:
        k = min(C, cfg.max_iter - n_iter)
        if k < C:
            if chunk_last is None:
                chunk_last = make_chunked_trainer(body, device_data, B, k,
                                                  shared_data=shared)
            state, auxs = chunk_last(state, jnp.asarray(n_iter % B))
        else:
            state, auxs = chunk(state, jnp.asarray(n_iter % B))
        import numpy as np
        auxs = jax.tree_util.tree_map(np.asarray, auxs)
        # replay the chunk's per-step aux rows at the reference log
        # cadence (EMA per iteration, print/log every L)
        for i in range(k):
            avg_acc = logger.update_accuracy(float(auxs["accuracy"][i]))
            it = n_iter + i + 1
            if it % L == 0 or it == cfg.max_iter:
                print("iter = %d\n\tloss = %f, accuracy (cur) = %f, "
                      "accuracy (avg) = %f, entropy = %f, validity = %f"
                      % (it, float(auxs["loss"][i]),
                         float(auxs["accuracy"][i]), avg_acc,
                         float(auxs["entropy"][i]),
                         float(auxs["validity"][i])), flush=True)
                logger.log(it,
                           {**{key: float(v[i])
                               for key, v in auxs.items()},
                            "avg_accuracy": avg_acc,
                            "baseline": float(state.baseline)})
        n_iter += k
        if (n_iter % cfg.snapshot_interval < k
                or n_iter == cfg.max_iter):
            path = snapshot_path(snapshot_dir, n_iter)
            save_params(path, state.params,
                        extra={"baseline": state.baseline})
            print("snapshot saved to " + path, flush=True)

    logger.close()
    return state


def make_eval_step(model):
    """Greedy-decode eval step returning scores/tokens/validity."""

    @jax.jit
    def eval_step(params, batch, rng):
        out = model.apply(
            params, batch["text_seq"], batch["seq_length"], batch["image"],
            rng, use_gt_layout=False, deterministic=True)
        return {
            "scores": out.scores,
            "predictions": jnp.argmax(out.scores, axis=1),
            "tokens": out.tokens,
            "validity": out.validity,
        }

    return eval_step
