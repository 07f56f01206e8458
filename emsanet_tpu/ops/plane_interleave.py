"""Pallas TPU kernel: batched parity-plane x2 interleave.

The decode-planes postprocessing pipeline interleaves only its FINAL
user-facing maps ((N, 4, H/2, W/2) parity planes -> (N, H, W)); XLA
lowers each as its own relayout at ~0.55 ms per f32 map at b32 640x480
(~5.5x its read+write roofline) plus fixed overhead per map at b1
(tools/b1_stage_probe.py: 0.515 ms for four 1.2 MB maps). This kernel
interleaves M maps in ONE launch: each map is a separate ref (no stack
copy — the stacked-transpose XLA variant measured a LOSS from exactly
that copy, postprocessing._BATCHED_INTERLEAVE), read tile-by-tile and
woven in VMEM with the decoder-megakernel interleave pattern
(ops/decoder_trunk.py::_cols_interleave/_rows_interleave).

f32 maps ride as bitcast int32 (bit-exact); bool and other dtypes stay
on the XLA path (8-bit tiling is not worth the cast traffic).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_tile(h2: int, w2: int, n_maps: int) -> int:
    # per map per tile: input (4, tile, w2) + output (2*tile, 2*w2),
    # both int32, double-buffered by the pipeline
    def fits(tile):
        est = n_maps * (4 * tile * w2 + 2 * tile * 2 * w2) * 4 * 2
        return est <= _VMEM_BUDGET

    for tile in range(h2, 0, -1):
        if h2 % tile == 0 and (tile % 8 == 0 or tile == h2) and fits(tile):
            return tile
    for tile in range(h2, 0, -1):
        if h2 % tile == 0 and fits(tile):
            return tile
    return 1


def col_weave_2d(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(H, W), (H, W) -> (H, 2W) with out[:, 2j] = a[:, j], odd = b.

    The direct `stack(axis=-1).reshape(h, 2w)` form passes interpret
    mode but FAILS real Mosaic lowering ("infer-vector-layout:
    unsupported shape cast" on vector<HxWx2> -> vector<Hx2W>). The
    transpose form lowers (tools/weave_lowering_probe.py): in
    transposed space a column weave is a leading-dim row weave, which
    Mosaic accepts.
    """
    h, w = a.shape
    t = jnp.stack([a.T, b.T], axis=1).reshape(2 * w, h)
    return t.T


def row_weave_2d(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(H, W), (H, W) -> (2H, W) with out[2i] = a[i], out[2i+1] = b[i]."""
    h, w = a.shape
    return jnp.stack([a, b], axis=1).reshape(2 * h, w)


def _interleave_kernel(*refs, tile_h: int, n_maps: int):
    ins, outs = refs[:n_maps], refs[n_maps:]
    for i in range(n_maps):
        x = ins[i][0]  # (4, tile, W2)
        # out[2y+p, 2x+q] = x[p*2+q, y, x]
        r0 = col_weave_2d(x[0], x[1])
        r1 = col_weave_2d(x[2], x[3])
        outs[i][0] = row_weave_2d(r0, r1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _interleave_many_i32(interpret: bool = False, *maps):
    n, _, h2, w2 = maps[0].shape
    m = len(maps)
    tile = _pick_tile(h2, w2, m)
    tiles = h2 // tile
    kern = functools.partial(_interleave_kernel, tile_h=tile, n_maps=m)
    return pl.pallas_call(
        kern,
        grid=(n * tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, 4, tile, w2),
                lambda i: (i // tiles, 0, i % tiles, 0),
                memory_space=pltpu.VMEM,
            )
        ] * m,
        out_specs=[
            pl.BlockSpec(
                (1, 2 * tile, 2 * w2),
                lambda i: (i // tiles, i % tiles, 0),
                memory_space=pltpu.VMEM,
            )
        ] * m,
        out_shape=[
            jax.ShapeDtypeStruct((n, 2 * h2, 2 * w2), jnp.int32)
        ] * m,
        interpret=interpret,
    )(*maps)


def interleave_planes_pallas(
    named: Dict[str, jnp.ndarray], interpret: bool = False
) -> Dict[str, jnp.ndarray]:
    """Interleave f32/int32 maps in one Pallas launch, others via XLA.

    Drop-in for `{k: interleave_plane(v) for k, v in named.items()}`
    (bit-exact: f32 maps are bitcast through int32).
    """
    from emsanet_tpu.postprocessing import interleave_plane

    if interpret is False and jax.default_backend() != "tpu":
        interpret = True
    kernel_items, out = [], {}
    for name, x in named.items():
        if x.dtype in (jnp.float32, jnp.int32) and x.shape[-1] >= 2:
            kernel_items.append((name, x.dtype))
        else:
            out[name] = interleave_plane(x)
    if kernel_items:
        packed = [
            jax.lax.bitcast_convert_type(named[nm], jnp.int32)
            if dt == jnp.float32 else named[nm]
            for nm, dt in kernel_items
        ]
        woven = _interleave_many_i32(interpret, *packed)
        for (nm, dt), w in zip(kernel_items, woven):
            out[nm] = (
                jax.lax.bitcast_convert_type(w, jnp.float32)
                if dt == jnp.float32 else w
            )
    return out
