"""Visualization tooling test: executor intermediates surface per-step
attention maps consistent with the final answer path."""

import os

import jax
import numpy as np

from n2nmn_tpu.tools.visualize import run_with_attentions, save_attention_maps
from tests.test_model import build, run


def test_run_with_attentions(tmp_path):
    model, grammar = build("clevr")
    rng = np.random.RandomState(0)
    N, T_enc = 4, 7
    text = rng.randint(0, 20, size=(T_enc, N)).astype(np.int32)
    lengths = rng.randint(2, T_enc + 1, size=N).astype(np.int32)
    image = rng.randn(N, 3, 4, 8).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0))

    result = run_with_attentions(model, params, text, lengths, image,
                                 jax.random.PRNGKey(1))
    T = model.cfg.netgen.T_decoder
    assert result["step_atts"].shape == (T, N, 3, 4)
    assert result["scores"].shape == (N, 5)
    assert len(result["module_names"]) == N
    # greedy scores must match the plain forward pass
    out = model.apply(params, text, lengths, image, jax.random.PRNGKey(1))
    np.testing.assert_allclose(result["scores"], np.asarray(out.scores),
                               rtol=1e-5, atol=1e-6)

    save_attention_maps(result, str(tmp_path), example_ids=[0, 1])
    assert os.path.exists(tmp_path / "example_0000.npz")
    data = np.load(tmp_path / "example_0000.npz")
    assert data["step_atts"].shape == (T, 3, 4)
