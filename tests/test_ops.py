"""Pallas kernel tests (interpret mode on CPU) vs jnp references."""

import jax.numpy as jnp
import numpy as np

from emsanet_tpu.ops.grouping import (
    group_pixels_argmin,
    group_pixels_argmin_reference,
)


def test_grouping_kernel_matches_reference():
    rng = np.random.RandomState(0)
    n, p, k = 2, 5000, 64  # p not a tile multiple -> exercises padding
    voted = jnp.asarray(rng.randn(n, p, 2) * 100, jnp.float32)
    centers = jnp.asarray(rng.randn(n, k, 2) * 100, jnp.float32)
    valid = jnp.asarray(rng.rand(n, k) > 0.3)

    idx_k, dist_k = group_pixels_argmin(voted, centers, valid, interpret=True)
    idx_r, dist_r = group_pixels_argmin_reference(voted, centers, valid)

    np.testing.assert_array_equal(np.asarray(idx_k), np.asarray(idx_r))
    np.testing.assert_allclose(
        np.asarray(dist_k), np.asarray(dist_r), rtol=1e-5
    )


def test_grouping_kernel_all_invalid():
    voted = jnp.zeros((1, 100, 2), jnp.float32)
    centers = jnp.zeros((1, 4, 2), jnp.float32)
    valid = jnp.zeros((1, 4), bool)
    idx, dist = group_pixels_argmin(voted, centers, valid, interpret=True)
    assert (np.asarray(dist) >= 1e12).all()
