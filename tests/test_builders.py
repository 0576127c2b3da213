"""Builder tests: SHAPES S-expression layouts (differential vs shipped
expert layouts), VGG backbone output shape, torchvision weight
conversion."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from n2nmn_tpu.data.builders.shapes_layouts import query_to_layout
from n2nmn_tpu.models import vgg_convert
from n2nmn_tpu.models.backbones import init_vgg16, vgg16_pool5

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("split", ["train.tiny", "train.small", "val",
                                   "test"])
def test_shapes_layouts_match_shipped(split):
    qf = os.path.join(REPO, "exp_shapes/shapes_dataset", f"{split}.query")
    lf = os.path.join(REPO, "exp_shapes/data",
                      f"{split}.query_layout_symbols.json")
    with open(lf) as f:
        expected = json.load(f)
    with open(qf) as f:
        mine = [query_to_layout(line) for line in f]
    assert mine == expected


def test_vgg_pool5_output_shape():
    params = init_vgg16(jax.random.PRNGKey(0))
    x = jnp.zeros((2, 320, 480, 3))
    out = vgg16_pool5(params, x)
    # CLEVR 480x320 -> [N, 10, 15, 512] (reference README.md:57 grid)
    assert out.shape == (2, 10, 15, 512)
    assert out.dtype == jnp.float32


def test_torchvision_conversion_layout():
    # fake torchvision state dict with recognizable values
    sd = {}
    shapes = {0: (64, 3), 2: (64, 64), 5: (128, 64), 7: (128, 128),
              10: (256, 128), 12: (256, 256), 14: (256, 256),
              17: (512, 256), 19: (512, 512), 21: (512, 512),
              24: (512, 512), 26: (512, 512), 28: (512, 512)}
    rng = np.random.RandomState(0)
    for idx, (out_c, in_c) in shapes.items():
        sd[f"features.{idx}.weight"] = rng.randn(
            out_c, in_c, 3, 3).astype(np.float32)
        sd[f"features.{idx}.bias"] = rng.randn(out_c).astype(np.float32)
    params = vgg_convert.from_torchvision_state_dict(sd, rgb_to_bgr=True)
    assert params["conv1_1"]["w"].shape == (3, 3, 3, 64)
    assert params["conv5_3"]["w"].shape == (3, 3, 512, 512)
    # BGR swap: conv1_1 input channel order reversed vs OIHW->HWIO
    w_plain = np.transpose(sd["features.0.weight"], (2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(params["conv1_1"]["w"]), w_plain[:, :, ::-1, :])


def test_resnet152_res5c_shape():
    from n2nmn_tpu.models import resnet
    params = resnet.init_random(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))   # 64/32 = 2x2 grid (tiny smoke)
    out = resnet.resnet152_res5c(params, x, compute_dtype=jnp.float32)
    assert out.shape == (1, 2, 2, 2048)
    assert out.dtype == jnp.float32
