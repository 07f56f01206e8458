"""Packed dual-stream encoder (models/packed_encoder.py) vs the flax oracle.

The per-stream FusedEncoder forward is the numerics oracle; the packed
grouped-conv execution path must reproduce it on the SAME variables
(packing is a trace-time view of the unchanged per-stream param tree).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emsanet_tpu.config import ModelConfig
from emsanet_tpu.models.encoder import FusedEncoder


def _model_cfg(**kw):
    base = dict(
        tasks=("semantic",),
        input_modalities=("rgb", "depth"),
        input_height=64,
        input_width=96,
        rgb_encoder_backbone="resnet18",
        depth_encoder_backbone="resnet18",
        rgb_encoder_backbone_block="nonbottleneck1d",
        depth_encoder_backbone_block="nonbottleneck1d",
        compute_dtype="float32",
    )
    base.update(kw)
    return ModelConfig(**base)


def _make(cfg, seed=0):
    enc = FusedEncoder(cfg=cfg)
    rng = np.random.RandomState(seed)
    inputs = {
        "rgb": jnp.asarray(rng.randn(2, 64, 96, 3), jnp.float32),
        "depth": jnp.asarray(rng.randn(2, 64, 96, 1), jnp.float32),
    }
    variables = enc.init(jax.random.PRNGKey(seed), inputs)
    # perturb running stats so BN folding is non-trivial (init leaves
    # mean=0, var=1); params stay at init and variances stay near 1 so
    # activations don't blow up over 4 stages (which would amplify f32
    # reassociation noise between the grouped and per-stream convs)
    perturbed = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda a: a
            + jnp.asarray(rng.uniform(0.05, 0.4, a.shape), a.dtype),
            variables["batch_stats"],
        ),
    }
    return enc, perturbed, inputs


def _flat(feats, skips):
    leaves = [feats["rgb"], feats["depth"]]
    for d in sorted(skips):
        leaves += [skips[d]["rgb"], skips[d]["depth"]]
    return leaves


@pytest.mark.parametrize("fusion", ["se-add-uni-rgb", "add-uni-depth"])
@pytest.mark.parametrize("fused_inference", [False, True])
def test_packed_matches_per_stream(fusion, fused_inference):
    cfg_ref = _model_cfg(encoder_fusion=fusion)
    enc_ref, variables, inputs = _make(cfg_ref)
    ref = enc_ref.apply(variables, inputs, train=False)

    cfg_packed = dataclasses.replace(
        cfg_ref, packed_dual_encoder=True, fused_inference=fused_inference
    )
    enc_packed = FusedEncoder(cfg=cfg_packed)
    out = enc_packed.apply(variables, inputs, train=False)

    for a, b in zip(_flat(*ref), _flat(*out)):
        assert a.shape == b.shape
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, rtol=3e-5
        )


def test_packed_ineligible_single_modality():
    """Single-modality encoders silently fall back to the flax path."""
    cfg = _model_cfg(
        input_modalities=("rgb",), encoder_fusion="none",
        packed_dual_encoder=True,
    )
    enc = FusedEncoder(cfg=cfg)
    rng = np.random.RandomState(0)
    inputs = {"rgb": jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32)}
    variables = enc.init(jax.random.PRNGKey(0), inputs)
    feats, skips = enc.apply(variables, inputs, train=False)
    assert feats["rgb"].shape == (1, 2, 3, 512)


def test_packed_training_uses_flax_path():
    """train=True must never take the packed (folded-BN) path."""
    cfg = _model_cfg(packed_dual_encoder=True)
    enc, variables, inputs = _make(cfg)
    # mutable batch_stats: the flax path updates running stats; the
    # packed path could not (it has no BN modules)
    (feats, skips), mutated = enc.apply(
        variables, inputs, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert "batch_stats" in mutated
    cfg_ref = dataclasses.replace(cfg, packed_dual_encoder=False)
    enc_ref = FusedEncoder(cfg=cfg_ref)
    (ref_feats, _), _ = enc_ref.apply(
        variables, inputs, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    np.testing.assert_allclose(
        np.asarray(feats["rgb"]), np.asarray(ref_feats["rgb"]),
        atol=1e-6, rtol=1e-6,
    )
