"""Fused ResNet-stem megakernel: both encoders' 7x7/2 conv + BN + ReLU +
3x3/2 maxpool as ONE Pallas call.

Round-4 profiling (tools/fwd_breakdown.py, CLAUDE.md) put the two stems
at ~6.5 ms of the ~51 ms b32 flagship forward against a ~1 ms roofline:
XLA lowers strided 7x7 convs over 1/3-channel inputs pathologically, and
the space-to-depth rewrite (models/backbone.py::ResNetStem) only
recovers part of it (depth stem 3.18->2.77 ms; the rgb stem LOSES at
batch). The fundamental waste XLA cannot remove is the 314 MB (b32)
conv+ReLU intermediate written to and re-read from HBM just to be
3x3/2-maxpooled down to 78 MB.

This kernel keeps the conv output in VMEM: HBM traffic is one read of
the packed input (~75 MB at b32) and one write of the pooled output
(2x 39 MB), ~4x less than XLA's floor for the same ops.

Design (see /opt/skills/guides/pallas_guide.md; reference stem:
torchvision ResNet conv1/bn1/relu/maxpool, SURVEY.md M1):
- RGB and depth inputs are concatenated channel-wise and 2x2
  space-to-depth packed OUTSIDE the kernel (exact rewrite of the 7x7/2
  as a stride-1 4x4 conv on the packed grid — same derivation as
  ResNetStem.space_to_depth), padded to 16 channel slots, and bitcast
  so 8 packed pixels x 16 slots ride the 128-lane axis. Mosaic
  requires >=128-lane HBM DMA slices (see nbt1d_chain._merge_c64),
  and this layout gives every matmul full 128-wide K tiles.
- per modality, the 4x4 conv splits into 4 row-taps (dy): each is ONE
  (rows*groups, 128) @ (128, 256) MXU matmul per output-column parity
  (even/odd conv pixels within a lane group), plus two small spill
  matmuls for taps that cross the 8-pixel group boundary. Weight
  matrices are assembled at trace time from the SAME (7,7,C,F) conv
  parameter (zero-pad + reshape + scatter; in-graph weight prep
  measured ~free, CLAUDE.md round-4 fused-params-cache note).
- folded BN (inference running stats) + ReLU in f32, then the 3x3/2
  maxpool runs separably in VMEM: rows via leading-dim strided views,
  columns via the even/odd parity split (pool col p = max(even[p],
  odd[p], odd[p-1]); odd[p-1] crosses lane groups with one lane shift
  + one sublane shift). Because ReLU output is >= 0, zero-filled
  out-of-image candidates can tie but never exceed a real max — the
  pool needs no -inf padding.
- outputs are written channel-merged (N, H/4, W/16, 4*64) and bitcast
  back to (N, H/4, W/4, 64) by the caller (a free reshape).

Exactness: bitwise-equal tap accumulation is NOT preserved vs the XLA
conv (different contraction grouping), but the oracle test locks it to
the flax ResNetStem at f32 within float tolerance, and bf16 production
behavior matches the other fused kernels (bf16 MXU inputs, f32
accumulation). Oracle: tests/test_stem_kernel.py.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emsanet_tpu.ops.nbt1d_chain import fold_bn

_CP = 16  # packed-channel slots per pixel (4 * total-input-channels <= 16)
_PX = 8   # pixels merged per 128-lane group (_PX * _CP == 128)
_VMEM_BUDGET = 12 * 1024 * 1024


def stem_kernel_supported(h: int, w: int, c_total: int) -> bool:
    """Shapes the kernel handles: see the gate notes in fused_stems."""
    if h % 8 or w % 128 or 4 * c_total > _CP:
        return False
    return _pick_tile_h(h // 4, (w // 2) // _PX, n_mod=2) is not None


def _pick_tile_h(hq: int, wm: int, n_mod: int) -> int | None:
    """Largest divisor row-tile of the pooled height fitting VMEM.

    The per-row cost is CALIBRATED against a measured Mosaic stack
    allocation (19.16 MB at tile=30/rc=61/wm=40/bf16, v5e): the scoped
    stack holds the f32 even/odd accumulators plus their transient tap
    results (~2x) and the row-shifted input copies, which a naive
    live-set count underestimates ~2x.
    """
    for tile in range(hq, 0, -1):
        if hq % tile:
            continue
        rp = 2 * tile + 4
        if rp > 2 * hq:  # DMA window must fit the packed image height
            continue
        rc = 2 * tile + 1
        fixed = (
            2 * rp * wm * 128 * 2              # double-buffered input (bf16)
            + n_mod * 4 * 128 * 704 * 2        # weight stacks
            + 2 * n_mod * tile * wm * 256 * 2  # pipelined output windows
        )
        per_rc = wm * (2 * 11 * 64 * 4 + 5 * 128 * 2)
        if fixed + rc * per_rc <= _VMEM_BUDGET:
            return tile
    return None


def pack_stem_inputs(xs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Concat modalities, 2x2 space-to-depth, pad to _CP slots, merge lanes.

    (N, H, W, C_total) -> (N, H/2, W/16, 128); slot order within a lane
    group is (pixel, 2x2-parity, channel) — the natural s2d memory order.
    """
    x = jnp.concatenate(xs, axis=-1) if len(xs) > 1 else xs[0]
    n, h, w, c = x.shape
    xp = x.reshape(n, h // 2, 2, w // 2, 2, c)
    xp = jnp.transpose(xp, (0, 1, 3, 2, 4, 5)).reshape(n, h // 2, w // 2, 4 * c)
    if 4 * c < _CP:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, _CP - 4 * c)))
    return xp.reshape(n, h // 2, (w // 2) // _PX, _PX * _CP)


def _pack_k4(k7: jnp.ndarray, c_off: int, c_total: int) -> jnp.ndarray:
    """(7,7,C,F) conv kernel -> (4,4,_CP,F) packed-grid taps.

    Same zero-pad + reshape identity as ResNetStem.space_to_depth
    (models/backbone.py:153-158), with the modality's channels embedded
    at slot offset `c_off` of the concatenated input.
    """
    kh, kw, c, f = k7.shape
    assert (kh, kw) == (7, 7)
    k7t = jnp.zeros((7, 7, c_total, f), k7.dtype)
    k7t = jax.lax.dynamic_update_slice(k7t, k7, (0, 0, c_off, 0))
    k8 = jnp.pad(k7t, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k4 = k8.reshape(4, 2, 4, 2, c_total, f)
    k4 = jnp.transpose(k4, (0, 2, 1, 3, 4, 5)).reshape(4, 4, 4 * c_total, f)
    if 4 * c_total < _CP:
        k4 = jnp.pad(k4, ((0, 0), (0, 0), (0, _CP - 4 * c_total), (0, 0)))
    return k4


def _tap_mat(k4: jnp.ndarray, px_out, group_shift: int) -> jnp.ndarray:
    """Weight matrix for conv output pixels `px_out` within a lane group.

    Returns (4, 128, len(px_out)*F): row = 16*px_in + slot of the input
    lane group shifted by `group_shift` groups; W[dy, row, j*F+f] =
    k4[dy, dx, slot, f] with dx = px_in + 8*group_shift - px_out[j] + 2
    (the packed conv pads (2,1) on each spatial dim), zero where dx is
    outside the 4 taps.
    """
    px_in = np.arange(_PX * _CP) // _CP
    slot = np.arange(_PX * _CP) % _CP
    px_out = np.asarray(px_out)
    dx = px_in[:, None] + _PX * group_shift - px_out[None, :] + 2  # (128, J)
    valid = (dx >= 0) & (dx <= 3)
    w = k4[:, np.clip(dx, 0, 3), slot[:, None], :]  # (4, 128, J, F)
    w = jnp.where(jnp.asarray(valid)[None, :, :, None], w, 0)
    return w.reshape(4, _PX * _CP, -1)


def _tap(x, w):
    """(R, Wm, 128) @ (128, N) MXU matmul, f32 accumulation."""
    precision = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    )
    return jnp.einsum(
        "rwc,co->rwo", x, w,
        preferred_element_type=jnp.float32, precision=precision,
    )


def _shift_rows(x, d: int):
    """x[j] <- x[j + d] along axis 0, zero fill."""
    if d == 0:
        return x
    zeros = jnp.zeros_like(x[: abs(d)])
    if d > 0:
        return jnp.concatenate([x[d:], zeros], axis=0)
    return jnp.concatenate([zeros, x[:d]], axis=0)


def _stem_kernel(
    x_ref,    # (N, Hp, Wm, 128) packed input — HBM, manual halo DMA
    we_ref,   # (M, 4, 128, 4F) even-pixel taps
    wo_ref,   # (M, 4, 128, 4F) odd-pixel taps
    wsl_ref,  # (M, 4, 128, 2F) left-spill taps [even p0 | odd p0]
    wsr_ref,  # (M, 4, 128, F)  right-spill taps (odd p3)
    bn_ref,   # (M, 2, 4F) folded BN scale/shift, f32
    *outs,    # M output refs (1, TILE, Wm, 4F) + scratch (in_buf, sems)
    n_mod: int,
    tile_h: int,
    tiles: int,
    hp: int,
    f: int,
):
    in_buf, sems = outs[n_mod:]
    outs = outs[:n_mod]
    rp = 2 * tile_h + 4
    rc = 2 * tile_h + 1
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    def make_dma(s, slot):
        n = s // tiles
        t = s % tiles
        start = jnp.clip(2 * t * tile_h - 3, 0, hp - rp)
        return pltpu.make_async_copy(
            x_ref.at[n, pl.ds(start, rp)], in_buf.at[slot], sems.at[slot]
        )

    @pl.when(step == 0)
    def _():
        make_dma(0, 0).start()

    @pl.when(step + 1 < n_steps)
    def _():
        make_dma(step + 1, (step + 1) % 2).start()

    make_dma(step, step % 2).wait()

    x = in_buf[step % 2]
    t = step % tiles
    # realign buf[j] = src[start + j] to x[j] = src[want + j]; the clamp
    # only engages at the first (-3) and last (+1) tiles, and shifted-in
    # rows are zero-filled = the conv's SAME zero padding (the packed
    # kernel's pad rows/cols carry zero weights, models/backbone.py:156)
    want = 2 * t * tile_h - 3
    shift = want - jnp.clip(want, 0, hp - rp)
    x = jnp.where(
        shift == -3, _shift_rows(x, -3),
        jnp.where(shift == 1, _shift_rows(x, 1), x),
    )

    # conv rows in this tile: global c0 + i, i in [0, rc)
    c0 = 2 * t * tile_h - 1
    rows = jax.lax.broadcasted_iota(jnp.int32, (rc, 1, 1), 0) + c0
    rmask = jnp.logical_and(rows >= 0, rows < hp).astype(jnp.float32)

    # neighbor lane groups for taps crossing the 8-pixel boundary
    # (hoisted: one shifted copy of the whole block, per-dy views below)
    xprev_full = jnp.concatenate(
        [jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1
    )
    xnext_full = jnp.concatenate(
        [x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1
    )

    for m in range(n_mod):
        e = o = None
        sl = sr = None
        for dy in range(4):
            xd = x[dy : dy + rc]
            te = _tap(xd, we_ref[m, dy])
            to = _tap(xd, wo_ref[m, dy])
            tl = _tap(xprev_full[dy : dy + rc], wsl_ref[m, dy])
            tr = _tap(xnext_full[dy : dy + rc], wsr_ref[m, dy])
            e = te if e is None else e + te
            o = to if o is None else o + to
            sl = tl if sl is None else sl + tl
            sr = tr if sr is None else sr + tr
        zpad = jnp.zeros((rc, e.shape[1], 2 * f), jnp.float32)
        e = e + jnp.pad(sl[..., :f], ((0, 0), (0, 0), (0, 3 * f)))
        o = o + jnp.concatenate([sl[..., f:], zpad, sr], axis=-1)
        scale = bn_ref[m, 0][None, None, :]
        bias = bn_ref[m, 1][None, None, :]
        e = jax.nn.relu(e * scale + bias) * rmask
        o = jax.nn.relu(o * scale + bias) * rmask

        def rowpool(a):
            # pool row j = max(conv rows 2j, 2j+1, 2j+2); rc = 2*tile_h+1
            pairs = a[:-1].reshape(tile_h, 2, a.shape[1], a.shape[2])
            nxt = _shift_rows(a, 2)[:-1].reshape(
                tile_h, 2, a.shape[1], a.shape[2]
            )
            return jnp.maximum(
                jnp.maximum(pairs[:, 0], pairs[:, 1]), nxt[:, 0]
            )

        e = rowpool(e)
        o = rowpool(o)
        # pool col p = max(even[p], odd[p], odd[p-1]); odd[p-1] at p=0
        # pulls the previous lane group's p=3 block
        o_up = jnp.concatenate(
            [jnp.zeros_like(o[..., :f]), o[..., : 3 * f]], axis=-1
        )
        om1 = jnp.concatenate(
            [jnp.zeros_like(o[:, :1]), o[:, :-1]], axis=1
        )
        o_wrap = jnp.concatenate(
            [om1[..., 3 * f :], jnp.zeros_like(o[..., : 3 * f])], axis=-1
        )
        res = jnp.maximum(jnp.maximum(e, o), o_up + o_wrap)
        outs[m][0] = res.astype(outs[m].dtype)


@functools.partial(
    jax.jit, static_argnames=("tile_h", "interpret", "out_dtype")
)
def fused_stems(
    xs: Sequence[jnp.ndarray],
    k7s: Sequence[jnp.ndarray],
    bn_params: Sequence[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    out_dtype=None,
    tile_h: int | None = None,
    interpret: bool = False,
) -> List[jnp.ndarray]:
    """Fused stem forward for one or two modalities sharing one input pack.

    xs: per-modality inputs (N, H, W, C_m), same N/H/W.
    k7s: per-modality (7, 7, C_m, F) conv kernels (no bias — reference
      stem convs are bias-free, BN follows).
    bn_params: per-modality (scale, bias, mean, var) inference BN.
    Returns per-modality pooled features (N, H/4, W/4, F).
    """
    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # CPU tests exercise the same code path
    n, h, w, _ = xs[0].shape
    c_total = sum(x.shape[-1] for x in xs)
    assert 4 * c_total <= _CP and h % 8 == 0 and w % 128 == 0, (h, w, c_total)
    f = k7s[0].shape[-1]
    n_mod = len(xs)
    hp, wm, hq, wq = h // 2, (w // 2) // _PX, h // 4, w // 4
    if tile_h is None:
        tile_h = _pick_tile_h(hq, wm, n_mod)
    assert tile_h is not None and hq % tile_h == 0, (hq, tile_h)
    tiles = hq // tile_h

    cdtype = xs[0].dtype
    out_dtype = out_dtype or cdtype
    packed = pack_stem_inputs(xs)

    we, wo, wsl, wsr, bn = [], [], [], [], []
    c_off = 0
    for x, k7, (g, b, mu, var) in zip(xs, k7s, bn_params):
        k4 = _pack_k4(k7, c_off, c_total)
        c_off += x.shape[-1]
        we.append(_tap_mat(k4, [0, 2, 4, 6], 0))
        wo.append(_tap_mat(k4, [1, 3, 5, 7], 0))
        wsl.append(_tap_mat(k4, [0, 1], -1))
        wsr.append(_tap_mat(k4, [7], +1))
        s, t = fold_bn(g, b, mu, var)
        bn.append(jnp.stack([jnp.tile(s, 4), jnp.tile(t, 4)]))
    we = jnp.stack(we).astype(cdtype)
    wo = jnp.stack(wo).astype(cdtype)
    wsl = jnp.stack(wsl).astype(cdtype)
    wsr = jnp.stack(wsr).astype(cdtype)
    bn = jnp.stack(bn).astype(jnp.float32)

    kernel = functools.partial(
        _stem_kernel,
        n_mod=n_mod, tile_h=tile_h, tiles=tiles, hp=hp, f=f,
    )
    rp = 2 * tile_h + 4
    outs = pl.pallas_call(
        kernel,
        grid=(n * tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tile_h, wm, 4 * f),
                lambda i: (i // tiles, i % tiles, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(n_mod)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, hq, wm, 4 * f), out_dtype)
            for _ in range(n_mod)
        ],
        scratch_shapes=[
            pltpu.VMEM((2, rp, wm, _PX * _CP), cdtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(packed, we, wo, wsl, wsr, bn)
    return [y.reshape(n, hq, wq, f) for y in outs]
