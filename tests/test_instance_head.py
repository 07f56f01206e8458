"""Exactness tests for the fused instance-head upsample kernel.

Oracle: conv + depth-to-space + per-channel encode (the production
final prediction stage; reference upsampling args.py:289-298, output
encodings model.py:122-132). Interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emsanet_tpu.ops.instance_head import (
    ENC_IDENTITY,
    ENC_SIGMOID,
    ENC_TANH,
    encodings_for,
    instance_head_upsample,
    instance_head_upsample_reference,
    interleave_channel,
)


@pytest.mark.parametrize(
    "n,h2,w2,c,enc",
    [
        (2, 16, 24, 5, encodings_for(5, True, True)),
        (1, 8, 8, 3, encodings_for(3, True, True)),
        (2, 4, 16, 5, encodings_for(5, False, True)),  # clamped halo
        (1, 2, 8, 4, (0, 0, 0, 0)),  # padded fallback, identity encode
    ],
)
def test_instance_head_matches_reference(n, h2, w2, c, enc):
    rng = np.random.RandomState(n * 31 + h2 + w2 + c)
    x = jnp.asarray(rng.randn(n, h2, w2, c), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 1, c), jnp.float32)

    got = instance_head_upsample(x, k, encodings=enc)
    want = instance_head_upsample_reference(x, k, encodings=enc)
    assert got.shape == (n, c, 4, h2, w2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
    )


def test_encodings_for_layout():
    assert encodings_for(5, True, True) == (
        ENC_SIGMOID, ENC_TANH, ENC_TANH, ENC_IDENTITY, ENC_IDENTITY
    )
    assert encodings_for(3, False, True) == (
        ENC_IDENTITY, ENC_TANH, ENC_TANH
    )


def test_interleave_roundtrip_matches_fullres():
    from emsanet_tpu.ops.polyphase_upsample import (
        depth_to_space,
        upsample2x_depthwise_polyphase_deferred,
    )

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 6, 8, 2), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 1, 2), jnp.float32)
    planes = instance_head_upsample(x, k, encodings=(0, 0))
    full = depth_to_space(upsample2x_depthwise_polyphase_deferred(x, k))
    for ch in range(2):
        np.testing.assert_allclose(
            np.asarray(interleave_channel(planes, ch)),
            np.asarray(full[..., ch], np.float32),
            rtol=1e-6, atol=1e-6,
        )


def test_explicit_tiles():
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 12, 16, 3), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 1, 3), jnp.float32)
    enc = encodings_for(3, True, True)
    want = instance_head_upsample_reference(x, k, encodings=enc)
    for tile in (2, 3, 6, 12):
        got = instance_head_upsample(x, k, encodings=enc, tile_h=tile)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6
        )


@pytest.mark.parametrize(
    "n,h2,w2,c,enc",
    [
        (2, 16, 24, 5, encodings_for(5, True, True)),
        (1, 8, 8, 3, encodings_for(3, True, True)),
        (1, 2, 8, 4, (0, 0, 0, 0)),  # padded fallback
    ],
)
def test_interleaved_variant_matches_reference(n, h2, w2, c, enc):
    from emsanet_tpu.ops.instance_head import (
        instance_head_upsample_interleaved,
    )

    rng = np.random.RandomState(n * 17 + h2 + w2 + c)
    x = jnp.asarray(rng.randn(n, h2, w2, c), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 1, c), jnp.float32)

    got = instance_head_upsample_interleaved(x, k, encodings=enc)
    planes = instance_head_upsample_reference(x, k, encodings=enc)
    assert got.shape == (n, c, 2 * h2, 2 * w2)
    for ch in range(c):
        np.testing.assert_allclose(
            np.asarray(got[:, ch]),
            np.asarray(interleave_channel(planes, ch)),
            rtol=1e-6, atol=1e-6,
        )


def test_interleave_all_channels_matches_per_channel():
    from emsanet_tpu.ops.instance_head import interleave_all_channels

    rng = np.random.RandomState(11)
    planes = jnp.asarray(rng.randn(2, 5, 4, 6, 8), jnp.float32)
    full = interleave_all_channels(planes)
    assert full.shape == (2, 5, 12, 16)
    for ch in range(5):
        np.testing.assert_allclose(
            np.asarray(full[:, ch]),
            np.asarray(interleave_channel(planes, ch)),
            rtol=0, atol=0,
        )
