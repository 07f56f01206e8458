"""Parity tests for the whole-trunk decoder megakernel.

The kernel (`ops/decoder_trunk.py`) must reproduce the flax dense-decoder
trunk (`models/decoder.py::DecoderModule` x N: conv_in + NBt1D blocks +
learned-3x3-zeropad x2 upsample + skip fusion) exactly up to dtype
rounding — the same oracle style as tests/test_nbt1d_chain.py. Runs in
Pallas interpret mode on the CPU backend (conftest forces cpu).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from emsanet_tpu.models.decoder import DecoderModule
from emsanet_tpu.ops.decoder_trunk import (
    decoder_trunk,
    stack_trunk_params,
    trunk_supported,
)

N_CHANNELS = (32, 16, 8)
SKIP_CHANNELS = (16, 8, 4)
DOWNSAMPLINGS = (16, 8, 4)
N_BLOCKS = 2


class _TrunkRef(nn.Module):
    """Flax oracle: the DenseDecoder module stack without the task head."""

    zero_init_residual: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, skips, train=False):
        for i, (feats, ds) in enumerate(zip(N_CHANNELS, DOWNSAMPLINGS)):
            x, _ = DecoderModule(
                features=feats,
                n_blocks=N_BLOCKS,
                block_dropout_p=0.2,
                side_output_channels=None,
                fusion="add-rgb",
                zero_init_residual=self.zero_init_residual,
                dtype=self.dtype,
                name=f"module{i}",
            )(x, skips[ds], train, True, False)
        return x


def _randomize(variables, rng):
    """Replace init values with random ones (zero-init BN scales would
    make the residual branches trivially identity)."""
    leaves, treedef = jax.tree_util.tree_flatten_with_path(variables)
    out = []
    for i, (path, leaf) in enumerate(leaves):
        key = jax.random.fold_in(rng, i)
        name = str(path[-1])
        if "var" in name:
            new = jax.random.uniform(
                key, leaf.shape, leaf.dtype, 0.5, 1.5)
        elif "mean" in name:
            new = 0.2 * jax.random.normal(key, leaf.shape, leaf.dtype)
        elif "scale" in name:
            new = 1.0 + 0.2 * jax.random.normal(key, leaf.shape, leaf.dtype)
        else:
            # small conv-weight scale keeps activations O(1) through the
            # 3-module stack so relative comparisons stay meaningful
            new = 0.08 * jax.random.normal(key, leaf.shape, leaf.dtype)
        out.append(new)
    return jax.tree_util.tree_unflatten(treedef, out)


def _make_inputs(rng, n, h0, w0, dtype):
    ctx = jax.random.normal(rng, (n, h0, w0, N_CHANNELS[0]), dtype)
    skips = {}
    h, w = h0, w0
    for ds, cs in zip(DOWNSAMPLINGS, SKIP_CHANNELS):
        h, w = 2 * h, 2 * w
        skips[ds] = {
            "rgb": jax.random.normal(
                jax.random.fold_in(rng, ds), (n, h, w, cs), dtype)
        }
    return ctx, skips


@pytest.mark.parametrize("zero_init", [True, False])
@pytest.mark.parametrize("w0", [4, 20])
def test_trunk_megakernel_parity_f32(zero_init, w0):
    """Kernel == flax trunk in f32 (w0=20 exercises the dead-column
    masks of the flagship 1/32 geometry; w0=4 the aligned path)."""
    rng = jax.random.PRNGKey(0)
    n, h0 = 2, 2
    ctx, skips = _make_inputs(rng, n, h0, w0, jnp.float32)

    models, all_params, all_stats = [], [], []
    for d in range(2):
        m = _TrunkRef(zero_init_residual=zero_init)
        v = m.init(jax.random.PRNGKey(d + 1), ctx, skips)
        v = _randomize(v, jax.random.fold_in(rng, 100 + d))
        models.append(m)
        all_params.append(v["params"])
        all_stats.append(v["batch_stats"])

    refs = [
        m.apply({"params": p, "batch_stats": s}, ctx, skips)
        for m, p, s in zip(models, all_params, all_stats)
    ]
    per_module = stack_trunk_params(all_params, all_stats, 3, N_BLOCKS)
    out = decoder_trunk(
        ctx, [skips[ds]["rgb"] for ds in DOWNSAMPLINGS], per_module,
        sublane_align=8 if w0 == 20 else None,
    )
    assert out.shape == (2,) + refs[0].shape
    for d in range(2):
        np.testing.assert_allclose(
            np.asarray(out[d]), np.asarray(refs[d]), rtol=2e-4, atol=2e-4
        )


def test_trunk_megakernel_parity_bf16():
    """bf16 compute path stays within bf16 rounding of the flax trunk."""
    rng = jax.random.PRNGKey(2)
    ctx, skips = _make_inputs(rng, 1, 2, 4, jnp.bfloat16)
    m = _TrunkRef(dtype=jnp.bfloat16)
    v = m.init(jax.random.PRNGKey(3), ctx, skips)
    v = _randomize(v, jax.random.fold_in(rng, 7))
    ref = m.apply(
        {"params": v["params"], "batch_stats": v["batch_stats"]},
        ctx, skips,
    )
    per_module = stack_trunk_params(
        [v["params"]], [v["batch_stats"]], 3, N_BLOCKS)
    out = decoder_trunk(
        ctx, [skips[ds]["rgb"] for ds in DOWNSAMPLINGS], per_module)
    np.testing.assert_allclose(
        np.asarray(out[0], np.float32), np.asarray(ref, np.float32),
        rtol=0.1, atol=0.1,
    )


def test_trunk_supported_flagship():
    """The flagship 640x480 R34 trunk geometry is supported at b<=8."""
    args = (15, 20, (512, 256, 128), 512, (256, 128, 64), 3)
    assert trunk_supported(1, *args)
    # weight streaming scales with batch: out of the latency regime XLA
    # wins (measured b8 -4.3%, tools/trunk_ab.py) — auto-gated off
    assert not trunk_supported(8, *args)
    assert trunk_supported(8, *args, max_batch=8)  # 'on' override
    # odd post-module widths are not (only module0 masks dead columns)
    assert not trunk_supported(1, 15, 21, (512, 256, 128), 512,
                               (256, 128, 64), 3)


def test_whole_model_megakernel_parity():
    """EMSANet with decoder_megakernel='on' == 'off' (head included)."""
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model

    def build(megakernel):
        cfg = EMSANetConfig(
            model=ModelConfig(
                tasks=("semantic", "instance", "orientation", "scene"),
                enable_panoptic=True,
                input_height=64,
                input_width=128,
                rgb_encoder_backbone="resnet18",
                depth_encoder_backbone="resnet18",
                compute_dtype="float32",
                fused_inference=True,
                decoder_megakernel=megakernel,
                head_decode_fusion="interleave",
            ),
            data=DataConfig(dataset="synthetic"),
        ).validate()
        ds = get_dataset_config(cfg.data)
        return EMSANet(cfg=cfg.model, dataset_config=ds)

    model_on = build("on")
    model_off = build("off")
    variables = init_model(model_on, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    batch = {
        "rgb": jnp.asarray(rng.randn(1, 64, 128, 3), jnp.float32),
        "depth": jnp.asarray(rng.randn(1, 64, 128, 1), jnp.float32),
    }
    out_on = model_on.apply(variables, batch, train=False)
    out_off = model_off.apply(variables, batch, train=False)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4),
        out_on, out_off,
    )
