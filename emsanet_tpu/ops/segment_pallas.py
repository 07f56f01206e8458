"""Pallas TPU kernels for the panoptic-merge segment reductions.

The merge needs, per image (P = H*W pixels, K instances, C classes):

1. a majority-vote histogram  hist[k, c] = sum_p [inst==k][sem==c] w_p,
2. per-instance orientation sums  osum[k, :] = sum_p [inst==k] orient_p,
3. per-pixel table lookups  out_p = table[inst_p]  (voted class + score).

jnp formulations either scatter (serialized on TPU) or scan over pixel
chunks with materialized one-hots (scan-step overhead dominated: ~80 ms
at batch 32 @ 640x480). These kernels stream pixel tiles through VMEM
once: masks are built in-register with broadcasted iota compares and the
reductions are (K, T) x (T, C) / (D, K) x (K, T) MXU dots; the histogram
outputs accumulate across grid steps in place.

Pixels ride the lane dimension throughout (lane-major layout, like
ops/grouping.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 4096


def _hist_kernel(inst_ref, sem_ref, w_ref, orient_ref, hist_ref, osum_ref):
    """Accumulate (K, C) vote histogram + (K, D) orientation sums.

    inst_ref/sem_ref: (1, T) int32; w_ref: (1, T) f32 (0/1 votes);
    orient_ref: (D, T) f32. Outputs map every grid step to the same
    block and accumulate.
    """
    i = pl.program_id(0)
    k = hist_ref.shape[0]
    c = hist_ref.shape[1]

    @pl.when(i == 0)
    def _():
        hist_ref[:] = jnp.zeros_like(hist_ref)
        osum_ref[:] = jnp.zeros_like(osum_ref)

    inst = inst_ref[0, :]
    t = inst.shape[0]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (k, t), 0)
    mask_k = (inst[None, :] == k_iota).astype(jnp.float32)  # (K, T)

    sem = sem_ref[0, :]
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (c, t), 0)
    sem_w = (sem[None, :] == c_iota).astype(jnp.float32) * w_ref[0, :][None, :]

    hist_ref[:] += jax.lax.dot_general(
        mask_k, sem_w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K, C)
    osum_ref[:] += jax.lax.dot_general(
        mask_k, orient_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K, D)


@functools.partial(jax.jit, static_argnames=("num_segments", "num_classes",
                                             "interpret"))
def segment_hist_and_sums(
    inst: jnp.ndarray,
    sem: jnp.ndarray,
    weights: jnp.ndarray,
    vectors: jnp.ndarray,
    num_segments: int,
    num_classes: int,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(hist (N, K, C), vec_sums (N, K, D)) over pixels.

    inst/sem/weights: (N, P); vectors: (N, P, D).
    """
    n, p = inst.shape
    d = vectors.shape[-1]
    p_pad = -(-p // _TILE) * _TILE
    if p_pad != p:
        # padded pixels: inst = num_segments would be out of the iota
        # range; point them at segment 0 with zero weight / zero vectors
        inst = jnp.pad(inst, ((0, 0), (0, p_pad - p)))
        sem = jnp.pad(sem, ((0, 0), (0, p_pad - p)))
        weights = jnp.pad(weights, ((0, 0), (0, p_pad - p)))
        vectors = jnp.pad(vectors, ((0, 0), (0, p_pad - p), (0, 0)))
        # zero the padded instance votes entirely (weight already 0 for
        # hist; vectors are summed unweighted, so zero-pad suffices)

    inst2 = inst.reshape(n, 1, p_pad)
    sem2 = sem.reshape(n, 1, p_pad)
    w2 = weights.astype(jnp.float32).reshape(n, 1, p_pad)
    vec2 = jnp.swapaxes(vectors.astype(jnp.float32), 1, 2)  # (N, D, P)

    def single(inst_i, sem_i, w_i, vec_i):
        return pl.pallas_call(
            _hist_kernel,
            grid=(p_pad // _TILE,),
            in_specs=[
                pl.BlockSpec((1, _TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, _TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, _TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((num_segments, num_classes), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((num_segments, d), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((num_segments, num_classes),
                                     jnp.float32),
                jax.ShapeDtypeStruct((num_segments, d), jnp.float32),
            ],
            interpret=interpret,
        )(inst_i, sem_i, w_i, vec_i)

    hist, osum = jax.vmap(single)(inst2, sem2, w2, vec2)
    return hist, osum


def _lookup_kernel(inst_ref, tables_ref, out_ref):
    """out[d, t] = tables[d, inst[t]] via (D, K) x (K, T) dot."""
    inst = inst_ref[0, :]
    k = tables_ref.shape[1]
    t = inst.shape[0]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (k, t), 0)
    mask_k = (inst[None, :] == k_iota).astype(jnp.float32)  # (K, T)
    out_ref[:] = jax.lax.dot_general(
        tables_ref[:], mask_k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def segment_lookup(
    inst: jnp.ndarray,
    tables: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-pixel table lookups: (N, P) keys + (N, D, K) tables -> (N, D, P).

    Values must be exactly representable in f32 (ints < 2^24 or floats).
    """
    n, p = inst.shape
    d, k = tables.shape[1], tables.shape[2]
    p_pad = -(-p // _TILE) * _TILE
    if p_pad != p:
        inst = jnp.pad(inst, ((0, 0), (0, p_pad - p)))
    inst2 = inst.reshape(n, 1, p_pad)
    tables = tables.astype(jnp.float32)

    def single(inst_i, tables_i):
        return pl.pallas_call(
            _lookup_kernel,
            grid=(p_pad // _TILE,),
            in_specs=[
                pl.BlockSpec((1, _TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((d, _TILE), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((d, p_pad), jnp.float32),
            interpret=interpret,
        )(inst_i, tables_i)

    out = jax.vmap(single)(inst2, tables)
    return out[:, :, :p]
