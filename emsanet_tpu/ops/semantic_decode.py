"""Pallas TPU megakernel: final semantic x2 upsample + argmax/score decode.

The deferred-interleave decode (postprocessing.postprocess_semantic_
polyphase) still pays ~14.4 ms at b32 640x480: the grouped polyphase
conv writes a 786 MB (N, H/2, W/2, 4C) tensor and the three decode
reductions (argmax / max / sumexp over classes) consume it across a
stride-4 lane axis, which XLA lowers via relayouts. Layout experiments
(tools/polyphase_layout_bench*.py) showed XLA canonicalizes every
logical-layout variant back to the same ~14.4 ms program; a parity-major
decode alone is 3.5 ms but no XLA producer emits that layout for free.

This kernel owns the layout instead: it consumes the *input* of the
final x2 stage (the half-res class logits) transposed to channel-major
(N, H/2, C, W/2) — W on lanes, classes on sublanes — computes the four
polyphase parity accumulators with 9 shifted FMAs each (exact
nearest-x2 + SAME-zero-pad depthwise-3x3 semantics, f32 accumulation),
and reduces argmax/max/sumexp over the class sublane axis in VMEM. HBM
traffic: read the 196 MB input once, write four (N, H/2, W/2) idx/score
parity planes (~79 MB) — the 786 MB intermediate never exists.

Reference semantics: prediction upsampling 'learned-3x3-zeropad'
(emsanet/args.py:289-298) + softmax argmax/score (SURVEY.md M6);
oracle: postprocess_semantic(depth_to_space(conv)) == this kernel's
interleaved output (tests/test_semantic_decode.py, interpret mode).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024  # scoped-vmem limit is 16 MB

# Trace-time A/B hook for tools/decode_ab.py ONLY: accumulate all 9
# polyphase taps per parity (the pre-optimization form) instead of
# skipping the 5 structurally-zero ones. Results are bitwise identical
# either way; production always uses the skipping (False) form.
_AB_FULL_TAPS = False


def _pick_tile(h: int, w: int, c: int, itemsize: int) -> int:
    """Largest divisor row-tile fitting input buffers + f32 accumulator.

    Mosaic requires the output block's sublane dim (tile rows) to be a
    multiple of 8 or the full extent, so 8-multiples are preferred and
    other divisors are a fallback for tiny (test) shapes.
    """

    def fits(tile):
        r = tile + 2
        est = (
            2 * r * c * w * itemsize  # double-buffered input
            + 3 * r * c * w * 4  # row-shifted f32 copies
            + 5 * r * c * w * 4  # 4 f32 accumulators + transient tap
            + 4 * r * w * 4  # decode temporaries
            + 4 * 4 * tile * w * 8  # pipelined output windows
        )
        return est <= _VMEM_BUDGET

    for tile in range(h, 0, -1):
        if h % tile == 0 and (tile % 8 == 0 or tile == h) and fits(tile):
            return tile
    for tile in range(h, 0, -1):
        if h % tile == 0 and fits(tile):
            return tile
    return 1


def _shift_rows(x, d):
    """x[r+d] along axis 0, zero fill (d in {-1, 0, +1})."""
    if d == 0:
        return x
    zero = jnp.zeros_like(x[:1])
    if d == -1:
        return jnp.concatenate([zero, x[:-1]], axis=0)
    return jnp.concatenate([x[1:], zero], axis=0)


def _shift_cols(x, d):
    """x[..., j+d] along the lane axis, zero fill."""
    if d == 0:
        return x
    zero = jnp.zeros_like(x[..., :1])
    if d == -1:
        return jnp.concatenate([zero, x[..., :-1]], axis=-1)
    return jnp.concatenate([x[..., 1:], zero], axis=-1)


def _clamped_start(t_idx, tile_h: int, window: int, img_h: int):
    want = t_idx * tile_h - 1
    return jnp.clip(want, 0, img_h - window)


def _shift_rows_by(x, d: int):
    if d == 0:
        return x
    zeros = jnp.zeros_like(x[: abs(d)])
    if d > 0:
        return jnp.concatenate([x[d:], zeros], axis=0)
    return jnp.concatenate([zeros, x[:d]], axis=0)


def _realign(buf, shift):
    """buf[j] = src[start + j] -> out[j] = src[want + j], halo 1."""
    out = buf
    out = jnp.where(shift == 1, _shift_rows_by(buf, 1), out)
    out = jnp.where(shift == -1, _shift_rows_by(buf, -1), out)
    return out


def _decode_kernel(
    x_ref,       # (N, H2, Cp, W2) channel-major — HBM
    kp_ref,      # (9, 4, Cp, 1) f32 VMEM: tap (di*3+dj), parity, channel
    idx_ref,     # out (1, 4, TILE, W2) int32 blocked
    score_ref,   # out (1, 4, TILE, W2) f32 blocked
    in_buf,      # scratch (2, R, Cp, W2)
    sems,        # DMA semaphores (2,)
    *,
    tile_h: int,
    tiles_per_image: int,
    img_h: int,
    n_classes: int,
    padded: bool,
    interleave_out: bool = False,
):
    r = tile_h + 2
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    def make_dma(step_idx, slot):
        n = step_idx // tiles_per_image
        t = step_idx % tiles_per_image
        if padded:
            start = t * tile_h  # padded coords: window always in bounds
        else:
            start = _clamped_start(t, tile_h, r, img_h)
        return pltpu.make_async_copy(
            x_ref.at[n, pl.ds(start, r)], in_buf.at[slot], sems.at[slot]
        )

    @pl.when(step == 0)
    def _():
        make_dma(0, 0).start()

    @pl.when(step + 1 < n_steps)
    def _():
        make_dma(step + 1, (step + 1) % 2).start()

    make_dma(step, step % 2).wait()

    x = in_buf[step % 2]  # (R, C, W2)
    t_idx = step % tiles_per_image
    if not padded:
        shift = (t_idx * tile_h - 1) - _clamped_start(
            t_idx, tile_h, r, img_h
        )
        x = _realign(x, shift)

    # zero out-of-image rows (exact SAME-zero-pad at the image border)
    local = jax.lax.broadcasted_iota(jnp.int32, (r, 1, 1), 0)
    grow = t_idx * tile_h + local - 1
    img_mask = jnp.logical_and(grow >= 0, grow < img_h)
    x = jnp.where(img_mask, x, jnp.zeros_like(x))

    # 3 row-shifted f32 copies (one cast each instead of one per tap);
    # each of the 9 col-shifted taps is built once and feeds all four
    # parity accumulators. Keeping all 9 f32 taps live OOMed the kernel
    # stack (19.6 MB); this keeps 3 rows + 1 tap + 4 accumulators.
    xf = x.astype(jnp.float32)
    rows = [_shift_rows(xf, -1), xf, _shift_rows(xf, +1)]

    # polyphase structure: nearest-x2 + 3x3 means each output parity
    # reads only TWO distinct input rows (row-parity 0: shifts {-1, 0};
    # row-parity 1: {0, +1}) and two distinct input columns — so 5 of
    # the 9 tap weights per parity are structurally ZERO
    # (ops/polyphase_upsample._PARITY_MAP). Skipping them at trace time
    # drops the accumulation from 36 to 16 VPU FMAs (bitwise-identical:
    # the skipped terms are exact +-0).
    def _parity_uses(par: int, shift_idx: int) -> bool:
        if _AB_FULL_TAPS:
            return True
        return shift_idx in ((0, 1) if par == 0 else (1, 2))

    accs = [None] * 4
    for di in range(3):
        for dj in (-1, 0, 1):
            t = di * 3 + (dj + 1)
            tap = None
            for p in range(4):
                if not (_parity_uses(p // 2, di)
                        and _parity_uses(p % 2, dj + 1)):
                    continue
                if tap is None:
                    tap = _shift_cols(rows[di], dj)
                term = tap * kp_ref[t, p]  # (C, 1) lane-splat broadcast
                accs[p] = term if accs[p] is None else accs[p] + term

    # padded class channels (Cp > n_classes) must never win the argmax
    # or contribute to sumexp; the mask is trace-time-skipped when the
    # class dim needed no padding
    cp = x.shape[1]
    if n_classes < cp:
        ch_ids = jax.lax.broadcasted_iota(jnp.int32, (1, cp, 1), 1)
        class_mask = ch_ids < n_classes

    idxs, scores = [], []
    for p in range(4):
        # round through the compute dtype: the interleave/legacy paths
        # argmax the conv output in the compute dtype (bf16 on TPU), so
        # keeping unrounded f32 here would flip near-tie argmaxes and
        # make predictions depend on the decode-fusion mode
        own = accs[p][1 : 1 + tile_h].astype(x.dtype).astype(jnp.float32)
        if n_classes < cp:
            own = jnp.where(class_mask, own, -jnp.inf)
        idx = jnp.argmax(own, axis=1).astype(jnp.int32)  # (TILE, W2)
        mx = jnp.max(own, axis=1)
        sumexp = jnp.sum(jnp.exp(own - mx[:, None, :]), axis=1)
        if interleave_out:
            idxs.append(idx)
            scores.append(1.0 / sumexp)
        else:
            idx_ref[0, p] = idx
            score_ref[0, p] = 1.0 / sumexp

    if interleave_out:
        # full-res interleaved write: out[2y+p, 2x+q] = plane[p*2+q][y, x]
        # (lowering-safe weaves — the naive minor-axis stack+reshape
        # column weave fails real Mosaic lowering, see plane_interleave)
        from emsanet_tpu.ops.plane_interleave import (
            col_weave_2d, row_weave_2d,
        )

        w_out = idx_ref.shape[-1]

        def weave(ms):
            r0 = col_weave_2d(ms[0], ms[1])
            r1 = col_weave_2d(ms[2], ms[3])
            return row_weave_2d(r0, r1)[:, :w_out]

        idx_ref[0] = weave(idxs)
        score_ref[0] = weave(scores)


@functools.partial(jax.jit, static_argnames=("interpret", "tile_h"))
def semantic_decode_fused_planes(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    interpret: bool = False,
    tile_h: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused final-x2-upsample + semantic decode, parity-plane outputs.

    Like `semantic_decode_fused` but returns the kernel's raw
    (idx (N, 4, H/2, W/2) int32, score (N, 4, H/2, W/2) f32) parity
    planes (parity = p*2+q) — the parity-domain postprocessing pipeline
    consumes these directly and interleaves only its final maps.

    x: (N, H/2, W/2, C) half-res class logits (input of the final
    'learned-3x3-zeropad' x2 stage); kernel: (3, 3, 1, C) depthwise.
    """
    from emsanet_tpu.ops.polyphase_upsample import polyphase_kernels

    if interpret is False and jax.default_backend() != "tpu":
        interpret = True
    n, h2, w2, c = x.shape
    # channel-major: W on lanes, classes on sublanes (XLA composes this
    # transpose with the producing depth-to-space transpose)
    xt = jnp.transpose(x, (0, 1, 3, 2))  # (N, H2, C, W2)
    # Mosaic HBM DMA slices must be (8, 128)-aligned on the last two
    # dims: pad W with REAL zeros (exactly the SAME-zero-pad the conv
    # needs at the right edge) AND the class dim to 8s (padded classes
    # are masked to -inf before the argmax/sumexp — e.g. SUNRGB-D's 37
    # classes are not 8-aligned)
    wp = -(-w2 // 128) * 128
    cp = -(-c // 8) * 8
    if wp != w2 or cp != c:
        xt = jnp.pad(
            xt, ((0, 0), (0, 0), (0, cp - c), (0, wp - w2))
        )
    kp = polyphase_kernels(kernel)  # (3, 3, 1, 4C) c-major c*4+p
    # round through the compute dtype (the conv path casts kp to x.dtype;
    # bf16xbf16 products are exact in f32, so the f32 FMA tree matches),
    # then (tap, parity, channel, 1) for sublane-aligned lane broadcast
    kp = kp.reshape(9, c, 4).astype(x.dtype).astype(jnp.float32)
    kp = jnp.transpose(kp, (0, 2, 1))  # (9, 4, C)
    if cp != c:
        kp = jnp.pad(kp, ((0, 0), (0, 0), (0, cp - c)))
    kp = kp[..., None]  # (9, 4, Cp, 1)

    if tile_h is None:
        tile_h = _pick_tile(h2, wp, cp, jnp.dtype(x.dtype).itemsize)
    tiles = h2 // tile_h
    r = tile_h + 2
    padded = r > h2  # tiny images: no in-bounds halo window; pad via XLA
    if padded:
        xt = jnp.pad(xt, ((0, 0), (1, 1), (0, 0), (0, 0)))

    kern = functools.partial(
        _decode_kernel,
        tile_h=tile_h,
        tiles_per_image=tiles,
        img_h=h2,
        n_classes=c,
        padded=padded,
    )
    idx4, score4 = pl.pallas_call(
        kern,
        grid=(n * tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 4, tile_h, wp),
                lambda i: (i // tiles, 0, i % tiles, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 4, tile_h, wp),
                lambda i: (i // tiles, 0, i % tiles, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 4, h2, wp), jnp.int32),
            jax.ShapeDtypeStruct((n, 4, h2, wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, r, cp, wp), xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xt, kp)

    return idx4[..., :w2], score4[..., :w2]


@functools.partial(jax.jit, static_argnames=("interpret", "tile_h"))
def semantic_decode_fused_interleaved(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    interpret: bool = False,
    tile_h: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Like `semantic_decode_fused` but interleaves IN the kernel.

    Returns full-res (idx (N, H, W) int32, score (N, H, W) f32) with
    the x2 polyphase interleave done in VMEM at the output write — the
    two XLA relayouts (~0.55 ms each per f32 map at b32 640x480) never
    run.
    """
    from emsanet_tpu.ops.polyphase_upsample import polyphase_kernels

    if interpret is False and jax.default_backend() != "tpu":
        interpret = True
    n, h2, w2, c = x.shape
    xt = jnp.transpose(x, (0, 1, 3, 2))  # (N, H2, C, W2)
    wp = -(-w2 // 128) * 128
    cp = -(-c // 8) * 8
    if wp != w2 or cp != c:
        xt = jnp.pad(
            xt, ((0, 0), (0, 0), (0, cp - c), (0, wp - w2))
        )
    kp = polyphase_kernels(kernel)  # (3, 3, 1, 4C) c-major c*4+p
    kp = kp.reshape(9, c, 4).astype(x.dtype).astype(jnp.float32)
    kp = jnp.transpose(kp, (0, 2, 1))  # (9, 4, C)
    if cp != c:
        kp = jnp.pad(kp, ((0, 0), (0, 0), (0, cp - c)))
    kp = kp[..., None]  # (9, 4, Cp, 1)

    if tile_h is None:
        tile_h = _pick_tile(h2, wp, cp, jnp.dtype(x.dtype).itemsize)
    tiles = h2 // tile_h
    r = tile_h + 2
    padded = r > h2
    if padded:
        xt = jnp.pad(xt, ((0, 0), (1, 1), (0, 0), (0, 0)))

    # interleaved valid columns 0..2*w2-1 are contiguous; emit exactly
    # 2*w2 when lane-aligned, else 2*wp and slice outside
    w_out = 2 * w2 if (2 * w2) % 128 == 0 else 2 * wp

    kern = functools.partial(
        _decode_kernel,
        tile_h=tile_h,
        tiles_per_image=tiles,
        img_h=h2,
        n_classes=c,
        padded=padded,
        interleave_out=True,
    )
    idx, score = pl.pallas_call(
        kern,
        grid=(n * tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, 2 * tile_h, w_out),
                lambda i: (i // tiles, i % tiles, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2 * tile_h, w_out),
                lambda i: (i // tiles, i % tiles, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 2 * h2, w_out), jnp.int32),
            jax.ShapeDtypeStruct((n, 2 * h2, w_out), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, r, cp, wp), xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xt, kp)

    return idx[..., : 2 * w2], score[..., : 2 * w2]


@functools.partial(jax.jit, static_argnames=("interpret", "tile_h"))
def semantic_decode_fused(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    interpret: bool = False,
    tile_h: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused final-x2-upsample + semantic decode.

    x: (N, H/2, W/2, C) half-res class logits (input of the final
    'learned-3x3-zeropad' x2 stage); kernel: (3, 3, 1, C) depthwise.
    Returns (idx (N, H, W) int32, score (N, H, W) f32) identical (up to
    dtype rounding) to postprocess_semantic(depth_to_space(
    upsample2x_depthwise_polyphase_deferred(x, kernel))).
    """
    idx4, score4 = semantic_decode_fused_planes(
        x, kernel, interpret=interpret, tile_h=tile_h
    )
    n, _, h2, w2 = idx4.shape

    def interleave(planes):  # (N, 4, H2, W2), parity p*2+q -> (N, H, W)
        a = planes.reshape(n, 2, 2, h2, w2)
        a = jnp.transpose(a, (0, 3, 1, 4, 2))
        return a.reshape(n, 2 * h2, 2 * w2)

    return interleave(idx4), interleave(score4)


def semantic_decode_reference(
    x: jnp.ndarray, kernel: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """jnp oracle: conv + depth-to-space + full-res decode."""
    from emsanet_tpu.ops.polyphase_upsample import (
        depth_to_space,
        upsample2x_depthwise_polyphase_deferred,
    )
    from emsanet_tpu.postprocessing import postprocess_semantic

    y = depth_to_space(upsample2x_depthwise_polyphase_deferred(x, kernel))
    out = postprocess_semantic(y)
    return out["segmentation_idx"], out["score"]
