"""Checkpointing: flat-keyed npz snapshots with partial restore.

Replaces tf.train.Saver snapshots (reference
exp_clevr/train_clevr_gt_layout.py:159,220-223). Supports the reference's
two partial-restore patterns: restoring all-but-the-baseline when warm
starting policy search (train_clevr_rl_gt_layout.py:177-179) and
overwriting the encoder embedding with GloVe after init
(exp_vqa/train_vqa_gt_layout.py:160-164).

A pytree is flattened to {'a/b/c': array}; lists index numerically.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _set_path(tree, path, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        k = int(k) if isinstance(node, (list, tuple)) else k
        node = node[k]
    k = keys[-1]
    k = int(k) if isinstance(node, (list, tuple)) else k
    node[k] = value


def save_params(path, params, extra=None):
    """Write params (+ optional dict of scalars/arrays) to <path>.npz."""
    flat = _flatten(params)
    if extra:
        for k, v in extra.items():
            flat[f"__extra__/{k}"] = np.asarray(v)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)


def load_params(path, template, exclude=(), dtype=None, allow_missing=()):
    """Restore into a copy of ``template``; paths matching any prefix in
    ``exclude`` keep the template's value (partial restore). Returns
    (params, extra_dict).

    Template keys ABSENT from the checkpoint are an ERROR unless they
    match a prefix in ``exclude`` or ``allow_missing`` (or allow_missing
    is True). Silently keeping a fresh init for them would e.g. let a
    parity snapshot evaluate with --scene_ext and run an untrained
    objectness head, reporting silently-wrong _Scene-family accuracy —
    extension flags must match the snapshot (ADVICE r4 medium)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    params = jax.tree_util.tree_map(lambda x: x, template)  # shallow copy
    extra = {}
    tmpl_flat = _flatten(template)
    seen = set()
    for key in data.files:
        if key.startswith("__extra__/"):
            extra[key[len("__extra__/"):]] = data[key]
            continue
        if any(key.startswith(e) for e in exclude):
            continue
        if key not in tmpl_flat:
            raise KeyError(f"checkpoint key {key!r} not in param template")
        value = data[key]
        if dtype is not None:
            value = value.astype(dtype)
        if tuple(tmpl_flat[key].shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch for {key!r}: template "
                f"{tmpl_flat[key].shape} vs checkpoint {value.shape}")
        _set_path(params, key, jnp.asarray(value))
        seen.add(key)
    if allow_missing is not True:
        allow = tuple(exclude) + tuple(allow_missing)
        missing = [k for k in tmpl_flat if k not in seen
                   and not any(k.startswith(p) for p in allow)]
        if missing:
            raise KeyError(
                f"{len(missing)} template param(s) absent from checkpoint "
                f"{path!r} (first: {missing[:4]}). The model config does "
                "not match the snapshot — extension flags like "
                "--scene_ext/--num_mlp_ext/--count_mlp_ext must be the "
                "ones the snapshot was trained with. Pass allow_missing= "
                "prefixes (or True) for an intentional partial restore.")
    return params, extra


def snapshot_path(snapshot_dir, n_iter):
    """Reference-style zero-padded snapshot name '%08d'."""
    return os.path.join(snapshot_dir, "%08d" % n_iter)


# ---- full-train-state checkpointing (crash-resume; the reference can only
# warm-start weights manually via --pretrained_model, losing optimizer
# state — SURVEY.md §5 "checkpoint/resume") ----

def save_pytree(path, tree):
    """Save an arbitrary pytree (incl. optax states / namedtuples) using
    jax keypath-keyed arrays."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    flat = {jax.tree_util.keystr(p): np.asarray(v) for p, v in leaves}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)


def load_pytree(path, template):
    """Restore into the structure of ``template`` (same treedef)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
    out = []
    for p, tmpl in leaves:
        key = jax.tree_util.keystr(p)
        if key not in data:
            raise KeyError(f"state checkpoint missing {key!r}")
        value = data[key]
        tmpl_arr = np.asarray(tmpl)
        if tuple(value.shape) != tuple(tmpl_arr.shape):
            raise ValueError(f"shape mismatch for {key!r}")
        out.append(jnp.asarray(value))
    return jax.tree_util.tree_unflatten(treedef, out)


def latest_snapshot(snapshot_dir, suffix=".state.npz"):
    """Most recent '%08d<suffix>' snapshot in a directory, or None."""
    if not os.path.isdir(snapshot_dir):
        return None
    iters = []
    for name in os.listdir(snapshot_dir):
        if name.endswith(suffix):
            stem = name[: -len(suffix)]
            if stem.isdigit():
                iters.append(int(stem))
    if not iters:
        return None
    n = max(iters)
    return os.path.join(snapshot_dir, "%08d%s" % (n, suffix)), n
