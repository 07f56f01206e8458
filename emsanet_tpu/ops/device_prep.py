"""Fused on-device input normalization.

North-star design (BASELINE.json): the host pipeline ships raw uint8 RGB
and raw depth to the device; standardization runs on-device inside the
same jit program as the network, where XLA fuses it into the first
convolution's input read. Wins: 4x smaller host->device RGB transfers and
zero host float math (the reference normalizes in DataLoader workers,
SURVEY.md M9 NormalizeRGB/NormalizeDepth).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

# ImageNet statistics (preprocessing/transforms.py RGB_MEAN/RGB_STD)
_RGB_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_RGB_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_rgb_device(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, 3) uint8 -> standardized float32."""
    scale = jnp.asarray(1.0 / (255.0 * _RGB_STD), jnp.float32)
    shift = jnp.asarray(_RGB_MEAN / _RGB_STD, jnp.float32)
    return rgb_u8.astype(jnp.float32) * scale - shift


def normalize_depth_device(
    depth_raw: jnp.ndarray,
    depth_mean: float,
    depth_std: float,
    raw_depth: bool = False,
) -> jnp.ndarray:
    """(N, H, W, 1) raw-unit depth -> standardized float32.

    raw_depth keeps invalid (0) pixels at exactly 0 (reference
    NormalizeDepth semantics, emsanet/preprocessing.py:218-225).
    """
    d = depth_raw.astype(jnp.float32)
    normalized = (d - depth_mean) / depth_std
    if raw_depth:
        normalized = jnp.where(d > 0, normalized, 0.0)
    return normalized


def prepare_inputs_device(
    batch: Dict[str, jnp.ndarray],
    depth_mean: float,
    depth_std: float,
    raw_depth: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Normalize raw rgb/depth batch entries on-device (no-op for floats
    already normalized on host)."""
    out = dict(batch)
    rgb = batch.get("rgb")
    if rgb is not None and rgb.dtype == jnp.uint8:
        out["rgb"] = normalize_rgb_device(rgb)
    depth = batch.get("depth")
    if depth is not None and depth.dtype != jnp.float32:
        if depth.ndim == 3:
            depth = depth[..., None]
        out["depth"] = normalize_depth_device(
            depth, depth_mean, depth_std, raw_depth
        )
    return out
