"""Parity tests for the encoder stage-2..4 megakernel.

`ops/encoder_trunk.py` must reproduce the flax dual-backbone encoder
(stage-wise ResNetStage + SEFusion, models/encoder.py) exactly up to
dtype rounding. Interpret mode on the CPU backend (conftest forces cpu).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emsanet_tpu.config import ModelConfig
from emsanet_tpu.models.encoder import FusedEncoder


def _randomize(variables, rng):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(variables)
    out = []
    for i, (path, leaf) in enumerate(leaves):
        key = jax.random.fold_in(rng, i)
        name = str(path[-1])
        if "var" in name:
            new = jax.random.uniform(key, leaf.shape, leaf.dtype, 0.5, 1.5)
        elif "mean" in name:
            new = 0.2 * jax.random.normal(key, leaf.shape, leaf.dtype)
        elif "scale" in name:
            new = 1.0 + 0.2 * jax.random.normal(key, leaf.shape, leaf.dtype)
        else:
            # fan-in-scaled: keeps activations O(1) through ~10 blocks so
            # relative comparisons aren't drowned by accumulation order
            fan_in = max(1, int(np.prod(leaf.shape[:-1])))
            new = (0.8 / np.sqrt(fan_in)) * jax.random.normal(
                key, leaf.shape, leaf.dtype)
        out.append(new)
    return jax.tree_util.tree_unflatten(treedef, out)


def _cfg(megakernel: str, fusion: str = "se-add-uni-rgb",
         dtype: str = "float32") -> ModelConfig:
    return ModelConfig(
        tasks=("semantic", "instance", "orientation", "scene"),
        enable_panoptic=True,
        input_height=64,
        input_width=128,
        rgb_encoder_backbone="resnet18",
        depth_encoder_backbone="resnet18",
        encoder_fusion=fusion,
        compute_dtype=dtype,
        fused_inference=True,
        encoder_megakernel=megakernel,
    )


@pytest.mark.parametrize("fusion", ["se-add-uni-rgb", "add-uni-depth"])
def test_encoder_megakernel_parity_f32(fusion):
    enc_on = FusedEncoder(cfg=_cfg("on", fusion))
    enc_off = FusedEncoder(cfg=_cfg("off", fusion))
    rng = np.random.RandomState(0)
    inputs = {
        "rgb": jnp.asarray(rng.randn(2, 64, 128, 3), jnp.float32),
        "depth": jnp.asarray(rng.randn(2, 64, 128, 1), jnp.float32),
    }
    variables = enc_on.init(jax.random.PRNGKey(0), inputs)
    variables = _randomize(variables, jax.random.PRNGKey(42))

    feats_on, skips_on = enc_on.apply(variables, inputs)
    feats_off, skips_off = enc_off.apply(variables, inputs)

    assert sorted(skips_on) == sorted(skips_off)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4),
        (feats_on, skips_on), (feats_off, skips_off),
    )


def test_encoder_megakernel_parity_bf16():
    enc_on = FusedEncoder(cfg=_cfg("on", dtype="bfloat16"))
    enc_off = FusedEncoder(cfg=_cfg("off", dtype="bfloat16"))
    rng = np.random.RandomState(1)
    inputs = {
        "rgb": jnp.asarray(rng.randn(1, 64, 128, 3), jnp.float32),
        "depth": jnp.asarray(rng.randn(1, 64, 128, 1), jnp.float32),
    }
    variables = enc_on.init(jax.random.PRNGKey(1), inputs)
    variables = _randomize(variables, jax.random.PRNGKey(7))
    feats_on, skips_on = enc_on.apply(variables, inputs)
    feats_off, skips_off = enc_off.apply(variables, inputs)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0.15, atol=0.15),
        (feats_on, skips_on), (feats_off, skips_off),
    )


def test_encoder_trunk_supported_flagship():
    from emsanet_tpu.ops.encoder_trunk import encoder_trunk_supported

    args = dict(stage_features=(128, 256, 512), stage_blocks=(4, 6, 3),
                c_in=64)
    assert encoder_trunk_supported(1, 120, 160, **args)
    assert not encoder_trunk_supported(8, 120, 160, **args)  # latency-only
    assert encoder_trunk_supported(8, 120, 160, max_batch=8, **args)
    # odd widths break the stride-2 / sublane alignment
    assert not encoder_trunk_supported(1, 120, 100, **args)
