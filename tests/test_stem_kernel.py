"""Parity tests for the fused stem megakernel (ops/stem.py).

The kernel must reproduce the flax ResNetStem (strided 7x7 conv + BN +
ReLU + 3x3/2 maxpool, models/backbone.py) for every modality sharing
the packed input, up to float accumulation-order tolerance. Runs in
Pallas interpret mode on the CPU backend (conftest forces cpu).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emsanet_tpu.models.backbone import ResNetStem
from emsanet_tpu.ops.stem import fused_stems, stem_kernel_supported


def _stem_vars(c, seed):
    rng = np.random.RandomState(seed)
    stem = ResNetStem(dtype=jnp.float32, space_to_depth=False)
    v = stem.init(jax.random.PRNGKey(seed), jnp.zeros((1, 16, 128, c)))
    bn_p = {
        "scale": jnp.asarray(rng.rand(64) + 0.5, jnp.float32),
        "bias": jnp.asarray(rng.randn(64), jnp.float32),
    }
    bn_s = {
        "mean": jnp.asarray(rng.randn(64) * 0.1, jnp.float32),
        "var": jnp.asarray(rng.rand(64) + 0.5, jnp.float32),
    }
    return {
        "params": {"Conv_0": v["params"]["Conv_0"],
                   "Norm_0": {"BatchNorm_0": bn_p}},
        "batch_stats": {"Norm_0": {"BatchNorm_0": bn_s}},
    }


def _run_pair(xs, seeds):
    variables = [_stem_vars(x.shape[-1], s) for x, s in zip(xs, seeds)]
    refs = [
        ResNetStem(dtype=jnp.float32, space_to_depth=False).apply(v, x)
        for v, x in zip(variables, xs)
    ]
    k7s = tuple(v["params"]["Conv_0"]["kernel"] for v in variables)
    bns = tuple(
        (
            v["params"]["Norm_0"]["BatchNorm_0"]["scale"],
            v["params"]["Norm_0"]["BatchNorm_0"]["bias"],
            v["batch_stats"]["Norm_0"]["BatchNorm_0"]["mean"],
            v["batch_stats"]["Norm_0"]["BatchNorm_0"]["var"],
        )
        for v in variables
    )
    outs = fused_stems(tuple(xs), k7s, bns)
    return outs, refs


@pytest.mark.parametrize(
    "channels", [(3, 1), (3,), (1,), (4,)],
    ids=["rgb+depth", "rgb", "depth", "rgbd"],
)
def test_stem_kernel_matches_flax(channels):
    rng = np.random.RandomState(0)
    xs = [
        jnp.asarray(rng.randn(2, 64, 128, c), jnp.float32) for c in channels
    ]
    outs, refs = _run_pair(xs, seeds=list(range(len(channels))))
    for out, ref in zip(outs, refs):
        assert out.shape == ref.shape
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )


def test_stem_kernel_multi_tile():
    # h=96 -> pooled 24 rows; forces tile boundaries + the -3/+1 DMA
    # realign shifts at the first/last tiles
    rng = np.random.RandomState(1)
    xs = [
        jnp.asarray(rng.randn(1, 96, 128, 3), jnp.float32),
        jnp.asarray(rng.randn(1, 96, 128, 1), jnp.float32),
    ]
    outs, refs = _run_pair(xs, seeds=[5, 6])
    for out, ref in zip(outs, refs):
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )


def test_encoder_stem_megakernel_parity():
    """FusedEncoder with the stem megakernel on vs off (fused_inference
    eval path) must produce identical features/skips."""
    from emsanet_tpu.config import ModelConfig
    from emsanet_tpu.models import encoder as enc

    cfg = ModelConfig(
        tasks=("semantic",),
        input_height=64,
        input_width=128,
        rgb_encoder_backbone="resnet18",
        depth_encoder_backbone="resnet18",
        fused_inference=True,
    )
    model = enc.FusedEncoder(cfg=cfg)
    rng = np.random.RandomState(3)
    batch = {
        "rgb": jnp.asarray(rng.randn(2, 64, 128, 3), jnp.float32),
        "depth": jnp.asarray(rng.randn(2, 64, 128, 1), jnp.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch)
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda a: a
            + jnp.asarray(
                np.random.RandomState(1).uniform(0, 0.3, a.shape), a.dtype
            ),
            variables["batch_stats"],
        ),
    }
    old = enc.STEM_MEGAKERNEL
    try:
        enc.STEM_MEGAKERNEL = False
        ref = model.apply(variables, batch, train=False)
        enc.STEM_MEGAKERNEL = True
        out = model.apply(variables, batch, train=False)
    finally:
        enc.STEM_MEGAKERNEL = old
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4
        ),
        ref, out,
    )


def test_stem_kernel_supported_gate():
    assert stem_kernel_supported(480, 640, 4)
    assert not stem_kernel_supported(480, 320, 4)  # w % 128
    assert not stem_kernel_supported(60, 640, 4)  # h % 8
    assert not stem_kernel_supported(480, 640, 5)  # too many channels
