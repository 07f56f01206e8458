"""Parity tests for the batched Pallas plane-interleave kernel."""

import jax.numpy as jnp
import numpy as np
import pytest

from emsanet_tpu.ops.plane_interleave import interleave_planes_pallas
from emsanet_tpu.postprocessing import interleave_plane


@pytest.mark.parametrize("n,h2,w2", [(2, 8, 16), (1, 6, 10), (1, 2, 2)])
def test_matches_interleave_plane(n, h2, w2):
    rng = np.random.RandomState(n * 7 + h2 + w2)
    named = {
        "f": jnp.asarray(rng.randn(n, 4, h2, w2), jnp.float32),
        "i": jnp.asarray(
            rng.randint(0, 1 << 30, (n, 4, h2, w2)), jnp.int32
        ),
        "b": jnp.asarray(rng.rand(n, 4, h2, w2) > 0.5),
    }
    got = interleave_planes_pallas(named)
    for k, v in named.items():
        want = interleave_plane(v)
        assert got[k].dtype == want.dtype, k
        np.testing.assert_array_equal(
            np.asarray(got[k]), np.asarray(want), err_msg=k
        )


def test_nan_payloads_bit_exact():
    # f32 rides as bitcast int32: NaN payloads must survive
    x = np.full((1, 4, 2, 4), np.nan, np.float32)
    x[0, 1, 0, 0] = np.float32("-inf")
    got = interleave_planes_pallas({"m": jnp.asarray(x)})["m"]
    want = interleave_plane(jnp.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(got).view(np.int32), np.asarray(want).view(np.int32)
    )
