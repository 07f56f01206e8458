"""Pallas TPU kernel: instance-head final x2 upsample into plane layout.

The instance head's final prediction stage mirrors the semantic one
(learned-3x3-zeropad x2, emsanet/args.py:289-298) at C=5 (center 1 +
offset 2 + orientation 2; C=3 without orientation): grouped polyphase
conv + depth-to-space + sigmoid/tanh encodes. Measured in isolation at
b32 640x480 (tools/instance_head_bench.py): 4.9 ms, almost all of it
the depth-to-space relayout and the 5-channel-minor consumption layout
(the conv itself is ~0.5 ms of VPU work).

This kernel reads the half-res head output once (channel-major window
per row-tile: W on lanes, channels on sublanes — the same layout the
semantic decode kernel uses, ops/semantic_decode.py), computes the four
parity accumulators with shifted f32 FMAs (exact upsample semantics
incl. image-edge zero padding, clamped halo DMA windows), applies the
per-channel output encoding in-kernel (sigmoid for center, tanh for
offsets, identity for orientation — reference model.py:122-132), and
writes (N, C, 4, H/2, W/2) f32 parity planes with the channel MAJOR.
Each channel's full-res map is then a free slice + small interleave —
the (N, H, W, C) channel-minor tensor never materializes.

Oracle: instance_head_upsample_reference (conv + depth-to-space +
encode), locked by tests/test_instance_head.py in interpret mode.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 6 * 1024 * 1024  # Mosaic temporaries ~2x the estimate

ENC_IDENTITY, ENC_SIGMOID, ENC_TANH = 0, 1, 2


def encodings_for(
    n_channels: int, sigmoid_for_center: bool, tanh_for_offset: bool
) -> Tuple[int, ...]:
    """Per-channel encode codes for the instance head channel layout
    (center, offset_y, offset_x[, orientation_sin, orientation_cos])."""
    enc = [ENC_SIGMOID if sigmoid_for_center else ENC_IDENTITY]
    enc += [ENC_TANH if tanh_for_offset else ENC_IDENTITY] * 2
    enc += [ENC_IDENTITY] * (n_channels - 3)
    return tuple(enc[:n_channels])


def _pick_tile(h: int, w: int, c: int, itemsize: int,
               interleaved: bool = False) -> int:
    """Largest divisor row-tile (8-aligned preferred) fitting VMEM."""

    def fits(tile):
        r = tile + 2
        est = (
            2 * r * c * w * itemsize  # double-buffered input
            + 3 * r * c * w * 4  # row-shifted f32 copies
            + 2 * r * c * w * 4  # accumulator + transient tap
            + 2 * 4 * tile * c * w * 4  # pipelined output windows
        )
        if interleaved:
            # relayout temporaries for the in-kernel x2 interleave
            est += 2 * 4 * tile * c * w * 4
        return est <= _VMEM_BUDGET

    for tile in range(h, 0, -1):
        if h % tile == 0 and (tile % 8 == 0 or tile == h) and fits(tile):
            return tile
    for tile in range(h, 0, -1):
        if h % tile == 0 and fits(tile):
            return tile
    return 1


def _shift_rows(x, d):
    if d == 0:
        return x
    zero = jnp.zeros_like(x[:1])
    if d == -1:
        return jnp.concatenate([zero, x[:-1]], axis=0)
    return jnp.concatenate([x[1:], zero], axis=0)


def _shift_cols(x, d):
    if d == 0:
        return x
    zero = jnp.zeros_like(x[..., :1])
    if d == -1:
        return jnp.concatenate([zero, x[..., :-1]], axis=-1)
    return jnp.concatenate([x[..., 1:], zero], axis=-1)


def _shift_rows_by(x, d: int):
    if d == 0:
        return x
    zeros = jnp.zeros_like(x[: abs(d)])
    if d > 0:
        return jnp.concatenate([x[d:], zeros], axis=0)
    return jnp.concatenate([zeros, x[:d]], axis=0)


def _head_kernel(
    x_ref,       # (N, H2, Cp, W2) channel-major — HBM
    kp_ref,      # (9, 4, Cp, 1) f32 VMEM: tap, parity, channel
    out_ref,     # out (1, C, 4, TILE, W2) f32 blocked — channel MAJOR
    in_buf,      # scratch (2, R, Cp, W2)
    sems,        # DMA semaphores (2,)
    *,
    tile_h: int,
    tiles_per_image: int,
    img_h: int,
    encodings: Tuple[int, ...],
    n_out: int,
    padded: bool,
    interleave_out: bool = False,
):
    r = tile_h + 2
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    def clamped(t):
        if padded:
            return t * tile_h
        return jnp.clip(t * tile_h - 1, 0, img_h - r)

    def make_dma(step_idx, slot):
        n = step_idx // tiles_per_image
        t = step_idx % tiles_per_image
        return pltpu.make_async_copy(
            x_ref.at[n, pl.ds(clamped(t), r)], in_buf.at[slot],
            sems.at[slot],
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
        shift = (t_idx * tile_h - 1) - clamped(t_idx)
        x = jnp.where(shift == 1, _shift_rows_by(x, 1),
                      jnp.where(shift == -1, _shift_rows_by(x, -1), x))

    local = jax.lax.broadcasted_iota(jnp.int32, (r, 1, 1), 0)
    grow = t_idx * tile_h + local - 1
    img_mask = jnp.logical_and(grow >= 0, grow < img_h)
    x = jnp.where(img_mask, x, jnp.zeros_like(x))

    xf = x.astype(jnp.float32)
    rows = [_shift_rows(xf, -1), xf, _shift_rows(xf, +1)]

    # static per-channel encode masks on the sublane (channel) axis,
    # built from iota comparisons (pallas kernels cannot capture array
    # constants)
    c = x.shape[1]
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (1, c, 1), 1)

    def chan_mask(code):
        chans = [i for i, e in enumerate(encodings) if e == code]
        mask = ch_ids < 0  # all-false
        for i in chans:
            mask = jnp.logical_or(mask, ch_ids == i)
        return mask

    sig = chan_mask(ENC_SIGMOID)
    tnh = chan_mask(ENC_TANH)

    # each parity reads only 2 distinct input rows and columns (5 of
    # the 9 polyphase tap weights are structurally zero — see
    # ops/semantic_decode._decode_kernel); skip them at trace time
    def _parity_uses(par: int, shift_idx: int) -> bool:
        return shift_idx in ((0, 1) if par == 0 else (1, 2))

    taps = {}
    encs = []
    for p in range(4):
        acc = None
        for di in range(3):
            if not _parity_uses(p // 2, di):
                continue
            for dj in (-1, 0, 1):
                if not _parity_uses(p % 2, dj + 1):
                    continue
                t = di * 3 + (dj + 1)
                if (di, dj) not in taps:
                    taps[di, dj] = _shift_cols(rows[di], dj)
                term = taps[di, dj] * kp_ref[t, p]
                acc = term if acc is None else acc + term
        # round through the compute dtype for parity with the production
        # path (the conv emits compute dtype, encode reads it)
        own = acc[1 : 1 + tile_h].astype(x.dtype).astype(jnp.float32)
        enc = jnp.where(
            sig, jax.nn.sigmoid(own), jnp.where(tnh, jnp.tanh(own), own)
        )
        encs.append(enc)

    if interleave_out:
        # full-res interleaved write: out[ch, 2y+p, 2x+q] = enc[p*2+q][y, x]
        # (lowering-safe weaves — the naive minor-axis stack+reshape
        # column weave fails real Mosaic lowering, see plane_interleave)
        from emsanet_tpu.ops.plane_interleave import (
            col_weave_2d, row_weave_2d,
        )

        w_out = out_ref.shape[-1]
        for ch in range(n_out):
            r0 = col_weave_2d(encs[0][:, ch, :], encs[1][:, ch, :])
            r1 = col_weave_2d(encs[2][:, ch, :], encs[3][:, ch, :])
            full = row_weave_2d(r0, r1)
            out_ref[0, ch] = full[:, :w_out]
    else:
        # per-channel writes: channel is a MAJOR output dim, so the
        # consumer's per-channel map is a free slice (a rank-5 output
        # with channels second-minor measured 4.4 ms of relayout at b32
        # just to slice the 5 maps back out)
        for p in range(4):
            for ch in range(n_out):
                out_ref[0, ch, p] = encs[p][:, ch, :]


@functools.partial(
    jax.jit, static_argnames=("encodings", "interpret", "tile_h")
)
def instance_head_upsample(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    encodings: Tuple[int, ...] = (ENC_SIGMOID, ENC_TANH, ENC_TANH,
                                  ENC_IDENTITY, ENC_IDENTITY),
    interpret: bool = False,
    tile_h: int | None = None,
) -> jnp.ndarray:
    """Fused final-x2-upsample + per-channel encode (instance head).

    x: (N, H/2, W/2, C) half-res head output; kernel: (3, 3, 1, C)
    depthwise; encodings: per-channel ENC_* codes (length C). Returns
    (N, C, 4, H/2, W/2) f32 parity planes (parity = p*2+q, channel
    MAJOR); `interleave_channel` yields one channel's (N, H, W) map.
    """
    from emsanet_tpu.ops.polyphase_upsample import polyphase_kernels

    if interpret is False and jax.default_backend() != "tpu":
        interpret = True
    n, h2, w2, c = x.shape
    assert len(encodings) == c, (encodings, c)
    xt = jnp.transpose(x, (0, 1, 3, 2))  # (N, H2, C, W2)
    # Mosaic DMA slices must be (8, 128)-aligned on the last two dims;
    # pad lanes (W) AND sublanes (the 5-channel head) with zeros
    wp = -(-w2 // 128) * 128
    cp = -(-c // 8) * 8
    if wp != w2 or cp != c:
        xt = jnp.pad(
            xt, ((0, 0), (0, 0), (0, cp - c), (0, wp - w2))
        )
    kp = polyphase_kernels(kernel)  # (3, 3, 1, 4C) c-major
    kp = kp.reshape(9, c, 4).astype(x.dtype).astype(jnp.float32)
    kp = jnp.transpose(kp, (0, 2, 1))  # (9, 4, C)
    if cp != c:
        kp = jnp.pad(kp, ((0, 0), (0, 0), (0, cp - c)))
    kp = kp[..., None]  # (9, 4, Cp, 1)
    encodings = tuple(encodings) + (ENC_IDENTITY,) * (cp - c)

    if tile_h is None:
        tile_h = _pick_tile(h2, wp, cp, jnp.dtype(x.dtype).itemsize)
    tiles = h2 // tile_h
    r = tile_h + 2
    padded = r > h2
    if padded:
        xt = jnp.pad(xt, ((0, 0), (1, 1), (0, 0), (0, 0)))

    kern = functools.partial(
        _head_kernel,
        tile_h=tile_h,
        tiles_per_image=tiles,
        img_h=h2,
        encodings=tuple(encodings),
        n_out=c,
        padded=padded,
    )
    planes = pl.pallas_call(
        kern,
        grid=(n * tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, 4, tile_h, wp),
            lambda i: (i // tiles, 0, 0, i % tiles, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, c, 4, h2, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, r, cp, wp), xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xt, kp)
    return planes[..., :w2]


@functools.partial(
    jax.jit, static_argnames=("encodings", "interpret", "tile_h")
)
def instance_head_upsample_interleaved(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    encodings: Tuple[int, ...] = (ENC_SIGMOID, ENC_TANH, ENC_TANH,
                                  ENC_IDENTITY, ENC_IDENTITY),
    interpret: bool = False,
    tile_h: int | None = None,
) -> jnp.ndarray:
    """Like `instance_head_upsample` but emits full-res interleaved maps.

    Returns (N, C, H, W) f32 — each channel's user-facing map with the
    x2 polyphase interleave done IN the kernel, so the separate XLA
    relayout per map (~0.55 ms/map at b32 640x480) never runs. Channel
    stays MAJOR: per-channel consumption is a free slice.
    """
    from emsanet_tpu.ops.polyphase_upsample import polyphase_kernels

    if interpret is False and jax.default_backend() != "tpu":
        interpret = True
    n, h2, w2, c = x.shape
    assert len(encodings) == c, (encodings, c)
    xt = jnp.transpose(x, (0, 1, 3, 2))  # (N, H2, C, W2)
    wp = -(-w2 // 128) * 128
    cp = -(-c // 8) * 8
    if wp != w2 or cp != c:
        xt = jnp.pad(
            xt, ((0, 0), (0, 0), (0, cp - c), (0, wp - w2))
        )
    kp = polyphase_kernels(kernel)  # (3, 3, 1, 4C) c-major
    kp = kp.reshape(9, c, 4).astype(x.dtype).astype(jnp.float32)
    kp = jnp.transpose(kp, (0, 2, 1))  # (9, 4, C)
    if cp != c:
        kp = jnp.pad(kp, ((0, 0), (0, 0), (0, cp - c)))
    kp = kp[..., None]  # (9, 4, Cp, 1)
    encodings = tuple(encodings) + (ENC_IDENTITY,) * (cp - c)

    if tile_h is None:
        tile_h = _pick_tile(
            h2, wp, cp, jnp.dtype(x.dtype).itemsize, interleaved=True
        )
    tiles = h2 // tile_h
    r = tile_h + 2
    padded = r > h2
    if padded:
        xt = jnp.pad(xt, ((0, 0), (1, 1), (0, 0), (0, 0)))

    # interleaved valid columns 0..2*w2-1 are contiguous (both parities
    # of any padded column x >= w2 land at >= 2*w2); emit exactly 2*w2
    # when lane-aligned, else the full 2*wp and slice outside
    w_out = 2 * w2 if (2 * w2) % 128 == 0 else 2 * wp

    kern = functools.partial(
        _head_kernel,
        tile_h=tile_h,
        tiles_per_image=tiles,
        img_h=h2,
        encodings=tuple(encodings),
        n_out=c,
        padded=padded,
        interleave_out=True,
    )
    full = pl.pallas_call(
        kern,
        grid=(n * tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, 2 * tile_h, w_out),
            lambda i: (i // tiles, 0, i % tiles, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, c, 2 * h2, w_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, r, cp, wp), xt.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xt, kp)
    return full[..., : 2 * w2]


def interleave_all_channels(planes: jnp.ndarray) -> jnp.ndarray:
    """(N, C, 4, H/2, W/2) parity planes -> (N, C, H, W) in ONE transpose.

    XLA alternative to C separate `interleave_channel` calls: one big
    relayout amortizes the per-op fixed overhead; per-channel maps are
    then free major-axis slices.
    """
    n, c, _, h2, w2 = planes.shape
    a = planes.reshape(n, c, 2, 2, h2, w2)
    a = jnp.transpose(a, (0, 1, 4, 2, 5, 3))
    return a.reshape(n, c, 2 * h2, 2 * w2)


def interleave_channel(planes: jnp.ndarray, ch: int) -> jnp.ndarray:
    """(N, C, 4, H/2, W/2) parity planes -> channel ch's (N, H, W)."""
    n, _, _, h2, w2 = planes.shape
    a = planes[:, ch].reshape(n, 2, 2, h2, w2)
    a = jnp.transpose(a, (0, 3, 1, 4, 2))
    return a.reshape(n, 2 * h2, 2 * w2)


def instance_head_upsample_reference(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    encodings: Sequence[int] = (ENC_SIGMOID, ENC_TANH, ENC_TANH,
                                ENC_IDENTITY, ENC_IDENTITY),
) -> jnp.ndarray:
    """jnp oracle: conv + depth-to-space + encode, restacked as planes."""
    from emsanet_tpu.ops.polyphase_upsample import (
        depth_to_space,
        upsample2x_depthwise_polyphase_deferred,
    )

    n, h2, w2, c = x.shape
    full = depth_to_space(
        upsample2x_depthwise_polyphase_deferred(x, kernel)
    )  # (N, H, W, C), compute dtype
    parts = []
    for ch in range(c):
        m = full[..., ch].astype(jnp.float32)
        if encodings[ch] == ENC_SIGMOID:
            m = jax.nn.sigmoid(m)
        elif encodings[ch] == ENC_TANH:
            m = jnp.tanh(m)
        parts.append(m)
    full = jnp.stack(parts, axis=1)  # (N, C, H, W) f32
    # -> (N, C, 4, H/2, W/2), parity p*2+q
    full = full.reshape(n, c, h2, 2, w2, 2)
    return jnp.transpose(full, (0, 1, 3, 5, 2, 4)).reshape(
        n, c, 4, h2, w2
    )
