"""Pallas TPU kernel: pixel-to-center grouping (instance postprocessing).

The Panoptic-DeepLab grouping step assigns every pixel to the nearest of
K voted instance centers. The jnp formulation materializes the full
(N, H*W, K) f32 distance tensor in HBM (e.g. 8 x 307200 x 64 x 4B =
630 MB round-trip at 640x480 batch 8) purely to argmin-reduce it. This
kernel keeps the distances in VMEM registers and reduces in place — HBM
traffic drops to the (N, H*W) inputs/outputs.

Layout: pixels ride the 128-wide lane dimension ((K, TILE) distance
blocks), centers the sublane dimension; inputs are pre-transposed to
(N, 2, P) so every load is lane-contiguous.

Used by `emsanet_tpu.postprocessing.group_pixels_to_instances` on TPU;
the jnp path remains as CPU fallback and parity oracle.

Measured (TPU v5e, batch 8 @ 640x480, K=64): 0.815 ms vs 1.78 ms for the
jnp reference (2.2x) with bit-exact argmin indices. A first pixel-major
layout ((TILE, 2) blocks — 2 of 128 lanes used) ran at 5.9 ms; the
lane-major layout is what makes the kernel win.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 2048  # pixels (lanes) per grid step; (K, TILE) f32 = 512 KB @ K=64


def _grouping_kernel(voted_ref, centers_ref, valid_ref, idx_ref, dist_ref):
    """One tile of pixels vs all K centers, lane-major.

    voted_ref:   (2, TILE) f32 — voted (y; x) positions, pixels on lanes
    centers_ref: (2, K)   f32 — candidate centers
    valid_ref:   (1, K)   f32 — 1.0 valid / 0.0 invalid
    idx_ref:     (1, TILE) int32 out — argmin center index
    dist_ref:    (1, TILE) f32 out — min squared distance
    """
    v = voted_ref[:]  # (2, T)
    c = centers_ref[:]  # (2, K)
    invalid = 1.0 - valid_ref[:]  # (1, K)

    dy = c[0, :][:, None] - v[0, :][None, :]  # (K, T)
    dx = c[1, :][:, None] - v[1, :][None, :]  # (K, T)
    dist = dy * dy + dx * dx + invalid[0, :][:, None] * jnp.float32(1e12)

    idx_ref[:] = jnp.argmin(dist, axis=0, keepdims=True).astype(jnp.int32)
    dist_ref[:] = jnp.min(dist, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def group_pixels_argmin(
    voted: jnp.ndarray,
    centers: jnp.ndarray,
    centers_valid: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(best_idx, best_dist_sq) over centers for each pixel.

    voted: (N, P, 2) f32; centers: (N, K, 2) f32; centers_valid: (N, K)
    bool. Returns (N, P) int32 and (N, P) f32. P is padded to the tile
    size internally.
    """
    return group_pixels_argmin_t(
        jnp.swapaxes(voted, 1, 2), centers, centers_valid,
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def group_pixels_argmin_t(
    voted_t: jnp.ndarray,
    centers: jnp.ndarray,
    centers_valid: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`group_pixels_argmin` with pre-transposed voted (N, 2, P).

    Callers that hold the voted y/x as separate lane-major maps (the
    parity-plane postprocessing pipeline) stack them directly into this
    layout and skip the (N, P, 2) -> (N, 2, P) relayout entirely.
    """
    n, _, p = voted_t.shape
    k = centers.shape[1]
    p_pad = -(-p // _TILE) * _TILE

    if p_pad != p:
        voted_t = jnp.pad(voted_t, ((0, 0), (0, 0), (0, p_pad - p)))
    centers_t = jnp.swapaxes(centers, 1, 2)  # (N, 2, K)
    valid_f = centers_valid.astype(jnp.float32)[:, None, :]  # (N, 1, K)

    def single(voted_i, centers_i, valid_i):
        return pl.pallas_call(
            _grouping_kernel,
            grid=(p_pad // _TILE,),
            in_specs=[
                pl.BlockSpec((2, _TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, _TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((1, p_pad), jnp.int32),
                jax.ShapeDtypeStruct((1, p_pad), jnp.float32),
            ],
            interpret=interpret,
        )(voted_i, centers_i, valid_i)

    idx, dist = jax.vmap(single)(voted_t, centers_t, valid_f)
    return idx[:, 0, :p], dist[:, 0, :p]


def group_pixels_argmin_reference(
    voted: jnp.ndarray,
    centers: jnp.ndarray,
    centers_valid: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """jnp reference implementation (materializes (N, P, K))."""
    d = voted[:, :, None, :] - centers[:, None, :, :]
    dist = jnp.sum(d * d, axis=-1)
    dist = jnp.where(centers_valid[:, None, :], dist, 1e12)
    return (
        jnp.argmin(dist, axis=-1).astype(jnp.int32),
        jnp.min(dist, axis=-1),
    )
