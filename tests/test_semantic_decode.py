"""Exactness tests for the fused semantic conv+decode kernel.

Oracle: postprocess_semantic(depth_to_space(polyphase_conv)) — the
production deferred-decode path (reference semantics: learned-3x3-
zeropad prediction upsampling, emsanet/args.py:289-298, + softmax
argmax/score, SURVEY.md M6). Runs in Pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emsanet_tpu.ops.semantic_decode import (
    semantic_decode_fused,
    semantic_decode_reference,
)


@pytest.mark.parametrize(
    "n,h2,w2,c",
    [
        (2, 16, 24, 5),
        (1, 8, 8, 3),
        (2, 4, 16, 7),  # clamped-DMA halo windows
        (1, 2, 8, 4),   # r > h2: padded fallback
        (1, 30, 40, 40),  # flagship channel count
    ],
)
def test_fused_decode_matches_reference(n, h2, w2, c):
    rng = np.random.RandomState(n * 100 + h2 + w2 + c)
    x = jnp.asarray(rng.randn(n, h2, w2, c), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 1, c), jnp.float32)

    idx, score = semantic_decode_fused(x, k)
    ridx, rscore = semantic_decode_reference(x, k)

    assert idx.shape == (n, 2 * h2, 2 * w2)
    assert idx.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    np.testing.assert_allclose(
        np.asarray(score), np.asarray(rscore, np.float32),
        rtol=1e-5, atol=1e-6,
    )


def test_fused_decode_explicit_tile():
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(1, 12, 16, 6), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 1, 6), jnp.float32)
    for tile in (2, 3, 6, 12):
        idx, score = semantic_decode_fused(x, k, tile_h=tile)
        ridx, rscore = semantic_decode_reference(x, k)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
        np.testing.assert_allclose(
            np.asarray(score), np.asarray(rscore, np.float32),
            rtol=1e-5, atol=1e-6,
        )


def test_fused_decode_grad_free_path_jits():
    # decode is inference-only; ensure it traces under jit with bf16 input
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 8, 16, 4), np.float32).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 1, 4), jnp.float32)
    idx, score = jax.jit(semantic_decode_fused)(x, k)
    assert idx.shape == (1, 16, 32)
    assert score.dtype == jnp.float32


def test_fused_decode_bf16_rounding_parity():
    """At bf16 (the production compute dtype) the kernel must round the
    conv accumulators through bf16 before argmax — otherwise decode-mode
    predictions diverge from the interleave/legacy modes on near-tie
    pixels and become batch-size-dependent (the mode is picked per
    batch)."""
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 30, 128, 40), np.float32).astype(
        jnp.bfloat16
    )
    k = jnp.asarray(rng.randn(3, 3, 1, 40), jnp.float32)
    idx, score = semantic_decode_fused(x, k)
    ridx, rscore = semantic_decode_reference(x, k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    np.testing.assert_allclose(
        np.asarray(score), np.asarray(rscore, np.float32),
        rtol=1e-2, atol=1e-3,
    )


@pytest.mark.parametrize("c", [5, 37])
def test_fused_decode_non_8_aligned_classes(c):
    """Class counts not divisible by 8 (e.g. SUNRGB-D's 37) ride zero-
    padded channels that are masked to -inf before argmax/sumexp."""
    rng = np.random.RandomState(c)
    x = jnp.asarray(rng.randn(1, 8, 16, c), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 1, c), jnp.float32)
    idx, score = semantic_decode_fused(x, k)
    ridx, rscore = semantic_decode_reference(x, k)
    assert int(np.asarray(idx).max()) < c
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    np.testing.assert_allclose(
        np.asarray(score), np.asarray(rscore, np.float32),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize(
    "n,h2,w2,c",
    [
        (2, 16, 24, 37),
        (1, 8, 8, 3),
        (1, 2, 8, 8),  # padded fallback
    ],
)
def test_interleaved_variant_matches_fused(n, h2, w2, c):
    from emsanet_tpu.ops.semantic_decode import (
        semantic_decode_fused_interleaved,
    )

    rng = np.random.RandomState(n * 13 + h2 + w2 + c)
    x = jnp.asarray(rng.randn(n, h2, w2, c), jnp.float32)
    k = jnp.asarray(rng.randn(3, 3, 1, c), jnp.float32)

    idx, score = semantic_decode_fused_interleaved(x, k)
    ridx, rscore = semantic_decode_fused(x, k)
    assert idx.shape == (n, 2 * h2, 2 * w2)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ridx))
    np.testing.assert_allclose(
        np.asarray(score), np.asarray(rscore), rtol=1e-6, atol=1e-6
    )
