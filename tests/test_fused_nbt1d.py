"""Fused NBt1D Pallas kernel vs the flax block (numerics oracle)."""

import jax
import jax.numpy as jnp
import numpy as np

from emsanet_tpu.models.layers import NonBottleneck1D
from emsanet_tpu.ops.fused_nbt1d import fused_nbt1d, fused_nbt1d_params


def test_fused_matches_flax_block():
    c = 8
    block = NonBottleneck1D(features=c, dropout_p=0.0)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 16, c), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x)

    # randomize BN stats so folding is non-trivial
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    rng = np.random.RandomState(1)
    stats = jax.tree.map(
        lambda a: rng.uniform(0.5, 1.5, a.shape).astype(a.dtype), stats
    )
    variables = {"params": variables["params"], "batch_stats": stats}

    want = np.asarray(block.apply(variables, x, train=False))
    params = fused_nbt1d_params(variables["params"], variables["batch_stats"])
    got = np.asarray(fused_nbt1d(x, params, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_fused_zero_init_residual_variant():
    c = 8
    block = NonBottleneck1D(features=c, dropout_p=0.0, zero_init_residual=True)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 8, 8, c), jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), x)
    want = np.asarray(block.apply(variables, x, train=False))
    params = fused_nbt1d_params(
        jax.tree.map(np.asarray, variables["params"]),
        jax.tree.map(np.asarray, variables["batch_stats"]),
    )
    got = np.asarray(fused_nbt1d(x, params, interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-4)
    # zero-init: block acts as relu(x)
    np.testing.assert_allclose(got, np.maximum(np.asarray(x), 0), atol=2e-4)
