"""On-device input normalization vs host-side transforms parity."""

import jax.numpy as jnp
import numpy as np

from emsanet_tpu.ops.device_prep import (
    normalize_depth_device,
    normalize_rgb_device,
    prepare_inputs_device,
)
from emsanet_tpu.preprocessing.transforms import (
    NormalizeDepth,
    NormalizeRGB,
)


def test_rgb_normalization_matches_host():
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    device = np.asarray(normalize_rgb_device(jnp.asarray(rgb)))
    host = np.stack([NormalizeRGB()({"rgb": r})["rgb"] for r in rgb])
    np.testing.assert_allclose(device, host, atol=1e-5)


def test_depth_normalization_matches_host():
    rng = np.random.RandomState(1)
    depth = (rng.rand(2, 8, 8) * 9000).astype(np.float32)
    depth[0, 0, 0] = 0.0
    for raw in (True, False):
        device = np.asarray(
            normalize_depth_device(
                jnp.asarray(depth)[..., None], 2841.9, 1417.3, raw
            )
        )
        host = np.stack([
            NormalizeDepth(2841.9, 1417.3, raw)({"depth": d})["depth"]
            for d in depth
        ])
        np.testing.assert_allclose(device, host, atol=1e-4)


def test_prepare_inputs_passthrough_for_floats():
    batch = {
        "rgb": jnp.zeros((1, 4, 4, 3), jnp.float32),
        "depth": jnp.zeros((1, 4, 4, 1), jnp.float32),
    }
    out = prepare_inputs_device(batch, 1000.0, 500.0)
    assert out["rgb"] is batch["rgb"]
    assert out["depth"] is batch["depth"]


def test_prepare_inputs_converts_raw():
    batch = {
        "rgb": jnp.full((1, 4, 4, 3), 128, jnp.uint8),
        "depth": jnp.full((1, 4, 4, 1), 2000, jnp.uint16),
    }
    out = prepare_inputs_device(batch, 1000.0, 500.0)
    assert out["rgb"].dtype == jnp.float32
    assert out["depth"].dtype == jnp.float32
    assert float(out["depth"][0, 0, 0, 0]) == 2.0
