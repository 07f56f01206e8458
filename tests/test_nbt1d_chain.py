"""Fused NBt1D chain kernel (ops/nbt1d_chain.py) vs the flax oracle.

The flax NonBottleneck1D block (models/layers.py) is the numerics
oracle; the Pallas kernel must match it exactly (f32 rounding) for any
row tiling, including image-edge zero padding and the zero-init-residual
BN naming variant. Runs in interpreter mode on the CPU test backend —
the same code path the TPU compiles.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from emsanet_tpu.models.layers import NonBottleneck1D
from emsanet_tpu.ops.nbt1d_chain import (
    chain_supported,
    nbt1d_chain,
    stack_chain_params,
)


class _Chain(nn.Module):
    n_blocks: int
    features: int
    zero_init: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        for i in range(self.n_blocks):
            x = NonBottleneck1D(
                features=self.features,
                zero_init_residual=self.zero_init,
                name=f"block{i}",
            )(x, train=train)
        return x


def _make(n_blocks, features, zero_init, shape, seed=0):
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(rng, shape, jnp.float32)
    m = _Chain(n_blocks=n_blocks, features=features, zero_init=zero_init)
    variables = m.init(rng, x)
    # randomize BN running stats so folding is non-trivial
    bs = jax.tree.map(
        lambda a: a
        + jnp.asarray(
            np.random.RandomState(seed).uniform(0, 0.5, a.shape), a.dtype
        ),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    ref = m.apply(variables, x, train=False)
    stacked = stack_chain_params(
        [variables["params"][f"block{i}"] for i in range(n_blocks)],
        [variables["batch_stats"][f"block{i}"] for i in range(n_blocks)],
    )
    return x, stacked, ref


@pytest.mark.parametrize("zero_init", [False, True])
@pytest.mark.parametrize("tile_h", [None, 8])
def test_chain_matches_flax(zero_init, tile_h):
    x, stacked, ref = _make(3, 64, zero_init, (2, 24, 16, 64))
    out = nbt1d_chain(x, stacked, tile_h=tile_h, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_chain_k2_c128():
    x, stacked, ref = _make(2, 128, False, (1, 16, 8, 128), seed=3)
    out = nbt1d_chain(x, stacked, tile_h=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_chain_supported():
    # flagship shapes
    assert chain_supported(120, 160, 64, 3)      # encoder stage0
    assert chain_supported(60, 80, 128, 3)       # encoder stage1
    assert chain_supported(60, 80, 128, 3)       # decoder module2 blocks
    assert not chain_supported(30, 40, 256, 5)   # C=256: XLA is faster
    assert not chain_supported(30, 40, 512, 3)   # C=512 stays on XLA
    assert not chain_supported(60, 80, 128, 1)   # single block: no win
    assert not chain_supported(60, 20, 128, 3)   # W too small for tiles
    assert not chain_supported(60, 81, 128, 3)   # W not a multiple of 8


def test_chain_k1_latency_numerics():
    """K=1 chains (allowed only via the latency gate) stay exact."""
    x, stacked, ref = _make(1, 64, False, (1, 16, 16, 64), seed=5)
    out = nbt1d_chain(x, stacked, tile_h=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_chain_c256_numerics():
    """C=256 (latency-mode-only channel width) through the same kernel."""
    x, stacked, ref = _make(2, 256, False, (1, 16, 8, 256), seed=7)
    out = nbt1d_chain(x, stacked, tile_h=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_chain_stream_weights_numerics():
    """Weight-streaming variant (latency-mode C=512) stays exact; the
    test uses a small channel width — the DMA bookkeeping is the same."""
    x, stacked, ref = _make(2, 128, False, (1, 16, 8, 128), seed=11)
    out = nbt1d_chain(x, stacked, tile_h=8, interpret=True,
                      stream_weights=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_chain_odd_width_col_padding():
    """Widths that are not a multiple of 8 (the 15x20 1/32 maps) ride
    dead padding columns masked at each horizontal conv."""
    x, stacked, ref = _make(2, 128, False, (1, 16, 20, 128), seed=13)
    out = nbt1d_chain(x, stacked, tile_h=8, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5
    )
    out_s = nbt1d_chain(x, stacked, tile_h=8, interpret=True,
                        stream_weights=True)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_chain_clamped_vs_padded():
    """The clamped in-bounds DMA path (no jnp.pad round trip) is exact.

    Eligibility needs tile_h >= 2*halo and h >= tile_h + 2*halo — the
    flagship encoder/decoder chain shapes qualify, the tiny shapes in the
    tests above do not, so this test picks an eligible shape and locks
    both paths against the flax oracle AND each other. FORCE_PADDED is
    read at trace time, so the jit cache must be cleared when flipping it.
    """
    from emsanet_tpu.ops import nbt1d_chain as nch

    # k=2 -> halo=4; h=32, tile_h=8: r=16 <= 32, tile_h >= 2*halo
    x, stacked, ref = _make(2, 128, False, (2, 32, 8, 128), seed=17)
    # C=64 merged flagship-like shape: (120,32,64) -> merged C=128 w=16
    x64, stacked64, ref64 = _make(3, 64, False, (1, 120, 32, 64), seed=19)
    outs = {}
    old = nch.FORCE_PADDED
    try:
        for forced in (False, True):
            nch.FORCE_PADDED = forced
            nbt1d_chain.clear_cache()
            outs[forced] = nbt1d_chain(x, stacked, tile_h=8, interpret=True)
            np.testing.assert_allclose(
                np.asarray(outs[forced]), np.asarray(ref),
                atol=2e-5, rtol=2e-5,
            )
            # tile_h=24 >= 2*halo(12), r=36 <= 120: clamped-eligible
            out64 = nbt1d_chain(x64, stacked64, tile_h=24, interpret=True)
            np.testing.assert_allclose(
                np.asarray(out64), np.asarray(ref64), atol=2e-5, rtol=2e-5
            )
    finally:
        nch.FORCE_PADDED = old
        nbt1d_chain.clear_cache()
    # bit-identical across paths: same taps, same accumulation order
    np.testing.assert_array_equal(np.asarray(outs[False]),
                                  np.asarray(outs[True]))


def test_chain_stream_latency_gate():
    from emsanet_tpu.ops import nbt1d_chain as nch

    assert not nch.chain_stream_latency(1, 15, 20, 512, 3)  # off: default
    old = nch.LATENCY_MAX_PIXELS
    try:
        nch.LATENCY_MAX_PIXELS = 4800
        cs = nch.chain_stream_latency
        assert cs(1, 15, 20, 512, 3)   # dec module0 b1
        assert cs(1, 15, 20, 512, 2)   # enc stage3 tail b1
        assert cs(1, 15, 21, 512, 3)   # odd W: col-padded
        assert not cs(32, 15, 20, 512, 3)  # b32: XLA
        assert not cs(1, 30, 40, 256, 3)   # 256: resident
    finally:
        nch.LATENCY_MAX_PIXELS = old


def test_chain_supported_latency():
    from emsanet_tpu.ops import nbt1d_chain as nch

    # OFF by default: the whole-model A/B measured a loss (see module
    # comment on LATENCY_MAX_PIXELS)
    assert not nch.chain_supported_latency(1, 30, 40, 256, 5)
    old = nch.LATENCY_MAX_PIXELS
    try:
        nch.LATENCY_MAX_PIXELS = 4800
        assert nch.chain_supported_latency(1, 30, 40, 256, 5)
        assert nch.chain_supported_latency(4, 30, 40, 256, 3)
        assert not nch.chain_supported_latency(32, 30, 40, 256, 5)
        assert nch.chain_supported_latency(1, 30, 40, 256, 1)  # K=1 ok
        # C=512 rides the weight-streaming gate instead
        assert not nch.chain_supported_latency(1, 15, 20, 512, 2)
        assert not nch.chain_supported_latency(1, 16, 24, 512, 3)
        # weight-stack VMEM bound: very deep C=256 chains stay unfused
        assert not nch.chain_supported_latency(1, 30, 40, 256, 12)
    finally:
        nch.LATENCY_MAX_PIXELS = old


def test_fused_model_forward_matches_unfused():
    """End-to-end: EMSANet with fused_inference=True matches the plain
    forward on every output (VERDICT r1 next-steps #1 integration)."""
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model

    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance", "orientation", "scene"),
            enable_panoptic=True,
            input_height=96,
            input_width=128,
            rgb_encoder_backbone="resnet18",
            depth_encoder_backbone="resnet18",
        ),
        data=DataConfig(dataset="synthetic"),
    ).validate()
    ds = get_dataset_config(cfg.data)

    model = EMSANet(cfg=cfg.model, dataset_config=ds)
    variables = init_model(model, jax.random.PRNGKey(0))
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree.map(
            lambda a: a
            + jnp.asarray(
                np.random.RandomState(0).uniform(0, 0.3, a.shape), a.dtype
            ),
            variables["batch_stats"],
        ),
    }
    rng = np.random.RandomState(1)
    batch = {
        "rgb": jnp.asarray(rng.randn(1, 96, 128, 3), jnp.float32),
        "depth": jnp.asarray(rng.randn(1, 96, 128, 1), jnp.float32),
    }
    ref = model.apply(variables, batch, train=False)

    fused_model = EMSANet(
        cfg=dataclasses.replace(cfg.model, fused_inference=True),
        dataset_config=ds,
    )
    out = fused_model.apply(variables, batch, train=False)

    for task in ref:
        for key, a in ref[task].items():
            if isinstance(a, tuple):
                continue
            b = out[task][key]
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-4,
                err_msg=f"{task}/{key}",
            )


def test_fused_flag_does_not_change_training_graph():
    """fused_inference=True must not alter train-mode numerics: the
    chain kernel and polyphase upsampling are inference-only (round-2
    review finding: the polyphase path was not gated on train)."""
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model

    common = dict(
        tasks=("semantic", "instance"),
        input_height=96, input_width=128,
        rgb_encoder_backbone="resnet18", depth_encoder_backbone="resnet18",
    )
    ds_config = get_dataset_config(DataConfig(dataset="synthetic"))
    cfg_a = EMSANetConfig(
        model=ModelConfig(fused_inference=False, **common)).validate()
    cfg_b = EMSANetConfig(
        model=ModelConfig(fused_inference=True, **common)).validate()
    model_a = EMSANet(cfg=cfg_a.model, dataset_config=ds_config)
    model_b = EMSANet(cfg=cfg_b.model, dataset_config=ds_config)
    variables = init_model(model_a, jax.random.PRNGKey(0), train=True)

    rng = np.random.RandomState(0)
    batch = {
        "rgb": jnp.asarray(rng.randn(1, 96, 128, 3), jnp.float32),
        "depth": jnp.asarray(rng.randn(1, 96, 128, 1), jnp.float32),
    }
    outs = []
    for model in (model_a, model_b):
        out, _ = model.apply(
            variables, batch, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        outs.append(out)
    np.testing.assert_array_equal(
        np.asarray(outs[0]["semantic"]["logits"]),
        np.asarray(outs[1]["semantic"]["logits"]),
    )
    np.testing.assert_array_equal(
        np.asarray(outs[0]["instance"]["center"]),
        np.asarray(outs[1]["instance"]["center"]),
    )
