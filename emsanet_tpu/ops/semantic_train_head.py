"""Pallas TPU kernel: train-mode semantic head final x2 upsample + CE.

The train step's single biggest HBM cluster is the semantic head's
final 'learned-3x3-zeropad' x2 stage plus the full-resolution weighted
cross entropy (tools/train_hlo_bytes.py at b8 480x640 bf16: the up1
conv emits a 196.6 MB full-res logits tensor, its nearest-x2 input is a
196.6 MB broadcast, the CE consumes it in f32, and the backward
materializes the 196.6 MB dlogits plus reduce-sum chains — ~2.5-3 GB of
traffic ~= 3+ ms of a 90 ms step).

This kernel computes the loss directly from the HALF-RES head output:
it reads x (N, H/2, W/2, C) once, forms the four polyphase parity
logit accumulators in VMEM (exact nearest-x2 + SAME-zero-pad depthwise
conv semantics, the same tap structure as ops/semantic_decode.py), and
reduces the weighted-pixel-sum CE (losses.cross_entropy_semantic
semantics: void-ignored, per-class weights, label smoothing, bf16
logits materialization rounding) to two scalars. The full-res logits
never exist. The custom-VJP backward recomputes the parities with a
1-row halo, forms dlogits = gscale * w * (softmax - target_dist) in
registers, and emits dx (transposed polyphase conv) and the 16 nonzero
polyphase tap weight-gradient partials in the same pass.

Reference semantics: emsanet prediction upsampling
(emsanet/args.py:289-298) + nicr CE loss (SURVEY.md M10);
oracle: semantic_head_loss_reference (nearest-x2 + XLA depthwise conv +
losses.cross_entropy_semantic), locked by tests/test_train_head.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emsanet_tpu.ops.polyphase_upsample import polyphase_kernels

_VMEM_BUDGET = 7 * 1024 * 1024  # Mosaic temporaries run ~2x the estimate


def _parity_uses(par: int, shift_idx: int) -> bool:
    """Whether output parity `par` reads input row/col shift `shift_idx`
    (0/1/2 <-> -1/0/+1). 5 of 9 polyphase taps per parity are exact
    zeros (ops/polyphase_upsample._PARITY_MAP)."""
    return shift_idx in ((0, 1) if par == 0 else (1, 2))


def _nonzero_taps(p: int):
    for di in range(3):
        if not _parity_uses(p // 2, di):
            continue
        for dj in (-1, 0, 1):
            if not _parity_uses(p % 2, dj + 1):
                continue
            yield di, dj


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


def _realign(buf, shift, halo: int):
    """buf[j] = src[start + j] -> out[j] = src[want + j], |shift|<=halo."""
    out = buf
    for d in range(1, halo + 1):
        out = jnp.where(shift == d, _shift_rows_by(buf, d), out)
        out = jnp.where(shift == -d, _shift_rows_by(buf, -d), out)
    return out


def _clamped_start(t_idx, tile_h: int, halo: int, window: int, img_h: int):
    want = t_idx * tile_h - halo
    return jnp.clip(want, 0, img_h - window)


def _parity_accs(x, kp_ref, r_lo: int, r_hi: int):
    """Four polyphase parity accumulators, rows [r_lo, r_hi) of the
    window, via the 16 nonzero shifted f32 FMAs. x: (R, Cp, Wp) f32."""
    accs = []
    taps = {}
    for p in range(4):
        acc = None
        for di, dj in _nonzero_taps(p):
            t = di * 3 + (dj + 1)
            if (di, dj) not in taps:
                # row shift di-1 relative to the own row, then col shift
                taps[di, dj] = _shift_cols(_shift_rows(x, di - 1), dj)
            term = taps[di, dj][r_lo:r_hi] * kp_ref[t, p]
            acc = term if acc is None else acc + term
        accs.append(acc)
    return accs


def _ce_terms(own_bf, tgt, cw_ref, n_classes: int, label_smoothing: float):
    """Per-pixel CE pieces from bf16-rounded parity logits.

    own_bf: (R, Cp, Wp) bf16 logits (padded classes at -inf);
    tgt: (R, Wp) int32 target in the FULL label space (0 = void).
    Returns (nll, w, softmax, onehot) with nll/w (R, Wp) f32 and
    softmax (R, Cp, Wp) f32 — softmax/onehot only used by the backward.
    """
    cp = own_bf.shape[1]
    m_bf = jnp.max(own_bf, axis=1)
    d = (own_bf - m_bf[:, None, :]).astype(jnp.float32)
    ed = jnp.exp(d)
    sumexp = jnp.sum(ed, axis=1)
    logz = m_bf.astype(jnp.float32) + jnp.log(sumexp)

    valid = tgt > 0
    tgti = jnp.clip(tgt - 1, 0, n_classes - 1)
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (1, cp, 1), 1)
    onehot = ch_ids == tgti[:, None, :]
    zero_bf = jnp.zeros((), own_bf.dtype)
    tgt_logit = jnp.sum(
        jnp.where(onehot, own_bf, zero_bf).astype(jnp.float32), axis=1
    )
    nll = logz - tgt_logit
    if label_smoothing > 0.0:
        own_f = own_bf.astype(jnp.float32)
        if n_classes < cp:
            own_f = jnp.where(ch_ids < n_classes, own_f, 0.0)
        smooth = logz - jnp.sum(own_f, axis=1) / n_classes
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    w = jnp.sum(jnp.where(onehot, cw_ref[...], 0.0), axis=1)
    w = jnp.where(valid, w, 0.0)
    return nll, w, ed / sumexp[:, None, :], onehot


def _fwd_kernel(
    x_ref,      # (N, H2, Cp, Wp) channel-major bf16 — HBM
    lab_ref,    # (N, H2, 8, Wp) int32 parity-major labels — HBM
    kp_ref,     # (9, 4, Cp, 1) f32 VMEM
    cw_ref,     # (1, Cp, 1) f32 VMEM (padded classes weight 0)
    sums_ref,   # out (2, TILE, Wp) f32 elementwise-partial accumulator
                # [w*nll, w] — Mosaic rejects reductions over
                # offset-laid-out dims ("shape_invariant_numerics ...
                # zero offsets"), so the kernel only ever ADDS
                # elementwise and XLA does the scalar reduce
    x_buf,      # scratch (2, R, Cp, Wp)
    lab_buf,    # scratch (2, TILE, 8, Wp)
    sems_x,
    sems_l,
    *,
    tile_h: int,
    tiles_per_image: int,
    img_h: int,
    n_classes: int,
    label_smoothing: float,
    padded: bool,
):
    r = tile_h + 2
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    def dma_x(step_idx, slot):
        n = step_idx // tiles_per_image
        t = step_idx % tiles_per_image
        if padded:
            start = t * tile_h  # padded coords: window always in bounds
        else:
            start = _clamped_start(t, tile_h, 1, r, img_h)
        return pltpu.make_async_copy(
            x_ref.at[n, pl.ds(start, r)], x_buf.at[slot], sems_x.at[slot]
        )

    def dma_l(step_idx, slot):
        n = step_idx // tiles_per_image
        t = step_idx % tiles_per_image
        return pltpu.make_async_copy(
            lab_ref.at[n, pl.ds(t * tile_h, tile_h)], lab_buf.at[slot],
            sems_l.at[slot],
        )

    @pl.when(step == 0)
    def _():
        dma_x(0, 0).start()
        dma_l(0, 0).start()

    @pl.when(step + 1 < n_steps)
    def _():
        dma_x(step + 1, (step + 1) % 2).start()
        dma_l(step + 1, (step + 1) % 2).start()

    dma_x(step, step % 2).wait()
    dma_l(step, step % 2).wait()

    x = x_buf[step % 2]
    lab = lab_buf[step % 2]
    t_idx = step % tiles_per_image
    if not padded:
        shift = (t_idx * tile_h - 1) - _clamped_start(
            t_idx, tile_h, 1, r, img_h
        )
        x = _realign(x, shift, 1)

    local = jax.lax.broadcasted_iota(jnp.int32, (r, 1, 1), 0)
    grow = t_idx * tile_h + local - 1
    img_mask = jnp.logical_and(grow >= 0, grow < img_h)
    x = jnp.where(img_mask, x, jnp.zeros_like(x))

    xf = x.astype(jnp.float32)
    cp = x.shape[1]
    neg_inf = jnp.asarray(-jnp.inf, x.dtype)
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (1, cp, 1), 1)

    accs = _parity_accs(xf, kp_ref, 1, 1 + tile_h)
    s_part = None
    w_part = None
    for p in range(4):
        own_bf = accs[p].astype(x.dtype)
        if n_classes < cp:
            own_bf = jnp.where(ch_ids < n_classes, own_bf, neg_inf)
        tgt = lab[:, p, :]
        nll, w, _, _ = _ce_terms(
            own_bf, tgt, cw_ref, n_classes, label_smoothing
        )
        wnll = w * nll
        s_part = wnll if s_part is None else s_part + wnll
        w_part = w if w_part is None else w_part + w

    @pl.when(step == 0)
    def _():
        sums_ref[...] = jnp.zeros_like(sums_ref)

    sums_ref[0] += s_part
    sums_ref[1] += w_part


def _bwd_kernel(
    x_ref,      # (N, H2, Cp, Wp) bf16 — HBM
    lab_ref,    # (N, H2, 8, Wp) int32 — HBM
    kp_ref,     # (9, 4, Cp, 1) f32 VMEM
    cw_ref,     # (1, Cp, 1) f32 VMEM
    gs_ref,     # (1, 1) f32 VMEM: cotangent / weight-sum
    dx_ref,     # out (1, TILE, Cp, Wp) bf16 blocked
    dkp_ref,    # out (36, Cp, Wp) f32 lane-partial accumulator
                # (tap*4 + parity); the lane reduce happens in XLA
    x_buf,      # scratch (2, R2, Cp, Wp)
    lab_buf,    # scratch (2, R1, 8, Wp)
    dz_buf,     # scratch (4, R1, Cp, Wp) bf16
    prod_buf,   # scratch (TILE, Cp, Wp) f32 — offset-free reduce staging
    sems_x,
    sems_l,
    *,
    tile_h: int,
    tiles_per_image: int,
    img_h: int,
    n_classes: int,
    label_smoothing: float,
    padded: bool,
):
    r1 = tile_h + 2
    r2 = tile_h + 4
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    def dma_x(step_idx, slot):
        n = step_idx // tiles_per_image
        t = step_idx % tiles_per_image
        if padded:
            start = t * tile_h
        else:
            start = _clamped_start(t, tile_h, 2, r2, img_h)
        return pltpu.make_async_copy(
            x_ref.at[n, pl.ds(start, r2)], x_buf.at[slot], sems_x.at[slot]
        )

    def dma_l(step_idx, slot):
        n = step_idx // tiles_per_image
        t = step_idx % tiles_per_image
        if padded:
            start = t * tile_h
        else:
            start = _clamped_start(t, tile_h, 1, r1, img_h)
        return pltpu.make_async_copy(
            lab_ref.at[n, pl.ds(start, r1)], lab_buf.at[slot],
            sems_l.at[slot],
        )

    @pl.when(step == 0)
    def _():
        dma_x(0, 0).start()
        dma_l(0, 0).start()

    @pl.when(step + 1 < n_steps)
    def _():
        dma_x(step + 1, (step + 1) % 2).start()
        dma_l(step + 1, (step + 1) % 2).start()

    dma_x(step, step % 2).wait()
    dma_l(step, step % 2).wait()

    t_idx = step % tiles_per_image
    x = x_buf[step % 2]
    lab = lab_buf[step % 2]
    if not padded:
        x = _realign(
            x,
            (t_idx * tile_h - 2)
            - _clamped_start(t_idx, tile_h, 2, r2, img_h),
            2,
        )
        lab = _realign(
            lab,
            (t_idx * tile_h - 1)
            - _clamped_start(t_idx, tile_h, 1, r1, img_h),
            1,
        )

    local2 = jax.lax.broadcasted_iota(jnp.int32, (r2, 1, 1), 0)
    grow2 = t_idx * tile_h + local2 - 2
    x = jnp.where(
        jnp.logical_and(grow2 >= 0, grow2 < img_h), x, jnp.zeros_like(x)
    )
    # out-of-image dz rows must be zero; their labels came from clamped
    # windows (in-image data), so mask explicitly
    local1 = jax.lax.broadcasted_iota(jnp.int32, (r1, 1), 0)
    grow1 = t_idx * tile_h + local1 - 1
    row_ok = jnp.logical_and(grow1 >= 0, grow1 < img_h)

    xf = x.astype(jnp.float32)
    cp = x.shape[1]
    cdtype = x.dtype
    neg_inf = jnp.asarray(-jnp.inf, cdtype)
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (1, cp, 1), 1)
    class_mask_f = (ch_ids < n_classes).astype(jnp.float32)
    gscale = gs_ref[0, 0]

    # dz rows cover [own-1, own+1) -> acc rows [1, 1+r1) of the window
    accs = _parity_accs(xf, kp_ref, 1, 1 + r1)
    for p in range(4):
        own_bf = accs[p].astype(cdtype)
        if n_classes < cp:
            own_bf = jnp.where(ch_ids < n_classes, own_bf, neg_inf)
        tgt = jnp.where(row_ok, lab[:, p, :], 0)  # void outside image
        _, w, sm, onehot = _ce_terms(
            own_bf, tgt, cw_ref, n_classes, label_smoothing
        )
        if label_smoothing > 0.0:
            tdist = (1.0 - label_smoothing) * onehot.astype(jnp.float32) \
                + (label_smoothing / n_classes) * class_mask_f
        else:
            tdist = onehot.astype(jnp.float32)
        dz = (gscale * w)[:, None, :] * (sm - tdist)
        if n_classes < cp:
            dz = dz * class_mask_f
        dz_buf[p] = dz.astype(cdtype)

    # dx[t] = sum_{p, taps} kp[t,p] * dz[p, t - di, . - dj]
    # (dz row t - di lives at dz-local index t + 1 - di)
    dx = None
    for p in range(4):
        for di, dj in _nonzero_taps(p):
            t = di * 3 + (dj + 1)
            sl = dz_buf[p][2 - di : 2 - di + tile_h]
            term = _shift_cols(sl.astype(jnp.float32), -dj) * kp_ref[t, p]
            dx = term if dx is None else dx + term
    dx_ref[0] = dx.astype(cdtype)

    # dkp[t, p, c] = sum_{own i, j} dz[p, i, j, c] * x[i + di - 1, j + dj, c]
    # (own row i = t0 + t lives at x-window index t + 2, so the di tap
    # reads x rows [1 + di, 1 + di + tile))
    @pl.when(step == 0)
    def _():
        dkp_ref[...] = jnp.zeros_like(dkp_ref)

    for p in range(4):
        dz_own = dz_buf[p][1 : 1 + tile_h].astype(jnp.float32)
        for di, dj in _nonzero_taps(p):
            t = di * 3 + (dj + 1)
            xs = _shift_cols(
                xf[1 + di : 1 + di + tile_h], dj
            )
            # roundtrip the product through a scratch ref: Mosaic
            # rejects reductions over dims whose layout carries the
            # slice/shift offsets; a ref read is offset-free
            prod_buf[...] = dz_own * xs
            dkp_ref[t * 4 + p] += jnp.sum(prod_buf[...], axis=0)


def _pick_tile(h: int, w: int, c: int, bwd: bool) -> int:
    def fits(tile):
        if bwd:
            r2, r1 = tile + 4, tile + 2
            est = (
                2 * r2 * c * w * 2       # x double buffer
                + 2 * r1 * 8 * w * 4     # labels double buffer
                + 4 * r1 * c * w * 2     # dz store
                + 3 * r2 * c * w * 4     # shifted f32 rows
                + 3 * r1 * c * w * 4     # acc + softmax temporaries
                + 2 * tile * c * w * 4   # dx accumulator + reduce staging
                + 36 * c * w * 4         # dkp lane-partial accumulator
            )
        else:
            r = tile + 2
            est = (
                2 * r * c * w * 2
                + 2 * tile * 8 * w * 4
                + 3 * r * c * w * 4
                + 3 * tile * c * w * 4
            )
        return est <= _VMEM_BUDGET

    for tile in range(h, 0, -1):
        if h % tile == 0 and (tile % 8 == 0 or tile == h) and fits(tile):
            return tile
    for tile in range(h, 0, -1):
        if h % tile == 0 and fits(tile):
            return tile
    return 1


def _prep(x, kernel, target, class_weights):
    """Shared input layout: channel-major x, parity-major labels."""
    n, h2, w2, c = x.shape
    wp = -(-w2 // 128) * 128
    cp = -(-c // 8) * 8
    xt = jnp.transpose(x, (0, 1, 3, 2))
    if wp != w2 or cp != c:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, cp - c), (0, wp - w2)))

    kp = polyphase_kernels(kernel)  # (3, 3, 1, 4C) c-major
    kp = kp.reshape(9, c, 4).astype(x.dtype).astype(jnp.float32)
    kp = jnp.transpose(kp, (0, 2, 1))
    if cp != c:
        kp = jnp.pad(kp, ((0, 0), (0, 0), (0, cp - c)))
    kp = kp[..., None]

    # full-res labels -> (N, H2, 8, Wp) parity-major (p*2+q), padded
    # parities/lanes hold 0 = void (weight 0)
    lab = target.astype(jnp.int32).reshape(n, h2, 2, w2, 2)
    lab = jnp.transpose(lab, (0, 1, 2, 4, 3)).reshape(n, h2, 4, w2)
    lab = jnp.pad(lab, ((0, 0), (0, 0), (0, 4), (0, wp - w2)))

    if class_weights is None:
        cw = jnp.ones((c,), jnp.float32)
    else:
        cw = class_weights.astype(jnp.float32)
    cw = jnp.pad(cw, (0, cp - c))[None, :, None]  # (1, Cp, 1)
    return xt, kp, lab, cw, (n, h2, w2, c, cp, wp)


def _run_fwd(x, kernel, target, cw_arr, label_smoothing, interpret,
             tile_h=None):
    xt, kp, lab, cw, (n, h2, w2, c, cp, wp) = _prep(
        x, kernel, target, cw_arr
    )
    if tile_h is None:
        tile_h = _pick_tile(h2, wp, cp, bwd=False)
    tiles = h2 // tile_h
    padded = tile_h + 2 > h2  # tiny images: no in-bounds halo window
    if padded:
        xt = jnp.pad(xt, ((0, 0), (1, 1), (0, 0), (0, 0)))
    kern = functools.partial(
        _fwd_kernel,
        tile_h=tile_h,
        tiles_per_image=tiles,
        img_h=h2,
        n_classes=c,
        label_smoothing=float(label_smoothing),
        padded=padded,
    )
    sums = pl.pallas_call(
        kern,
        grid=(n * tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, tile_h, wp), lambda i: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, tile_h, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2, cp, wp), xt.dtype),
            pltpu.VMEM((2, tile_h, 8, wp), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xt, lab, kp, cw)
    return jnp.sum(sums[0]), jnp.sum(sums[1])


def _run_bwd(x, kernel, target, cw_arr, gscale, label_smoothing,
             interpret, tile_h=None):
    xt, kp, lab, cw, (n, h2, w2, c, cp, wp) = _prep(
        x, kernel, target, cw_arr
    )
    if tile_h is None:
        tile_h = _pick_tile(h2, wp, cp, bwd=True)
    tiles = h2 // tile_h
    padded = tile_h + 4 > h2
    if padded:
        xt = jnp.pad(xt, ((0, 0), (2, 2), (0, 0), (0, 0)))
        lab = jnp.pad(lab, ((0, 0), (1, 1), (0, 0), (0, 0)))
    kern = functools.partial(
        _bwd_kernel,
        tile_h=tile_h,
        tiles_per_image=tiles,
        img_h=h2,
        n_classes=c,
        label_smoothing=float(label_smoothing),
        padded=padded,
    )
    dxt, dkp = pl.pallas_call(
        kern,
        grid=(n * tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tile_h, cp, wp),
                lambda i: (i // tiles, i % tiles, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((36, cp, wp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h2, cp, wp), x.dtype),
            jax.ShapeDtypeStruct((36, cp, wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 4, cp, wp), xt.dtype),
            pltpu.VMEM((2, tile_h + 2, 8, wp), jnp.int32),
            pltpu.VMEM((4, tile_h + 2, cp, wp), xt.dtype),
            pltpu.VMEM((tile_h, cp, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xt, lab, kp, cw, gscale.reshape(1, 1).astype(jnp.float32))

    dx = jnp.transpose(dxt[:, :, :c, :w2], (0, 1, 3, 2))  # (N,H2,W2,C)

    # map the polyphase tap grads back to the 3x3 depthwise kernel:
    # kp[(di,dj),(p,q),c] = m[p,di,a] m[q,dj,b] k[a,b,c]
    from emsanet_tpu.ops.polyphase_upsample import _PARITY_MAP

    m = jnp.asarray(_PARITY_MAP, jnp.float32)  # (2, 3, 3) [p, d, a]
    dkp = jnp.sum(dkp, axis=-1)  # lane partials -> (36, Cp)
    dkp = dkp[:, :c].reshape(3, 3, 2, 2, c)  # (di, dj, p, q, c)
    dk = jnp.einsum("ijpqc,pia,qjb->abc", dkp, m, m)
    return dx, dk[:, :, None, :]  # (3, 3, 1, C)


def semantic_head_loss_reference(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    target: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Oracle: nearest-x2 + SAME depthwise conv + weighted CE (the exact
    unfused train path; differentiable by autodiff)."""
    from emsanet_tpu.losses import cross_entropy_semantic
    from emsanet_tpu.models.upsampling import nearest_x2

    c = x.shape[-1]
    up = nearest_x2(x)
    y = jax.lax.conv_general_dilated(
        up, kernel.astype(x.dtype),
        window_strides=(1, 1), padding="SAME",
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return cross_entropy_semantic(y, target, class_weights, label_smoothing)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_loss(label_smoothing, interpret, x, kernel, target, cw):
    s, w = _run_fwd(x, kernel, target, cw, label_smoothing, interpret)
    return s / jnp.maximum(w, 1e-12)


def _fused_loss_fwd(label_smoothing, interpret, x, kernel, target, cw):
    s, w = _run_fwd(x, kernel, target, cw, label_smoothing, interpret)
    w = jnp.maximum(w, 1e-12)
    return s / w, (x, kernel, target, cw, w)


def _fused_loss_bwd(label_smoothing, interpret, res, g):
    x, kernel, target, cw, w = res
    dx, dk = _run_bwd(
        x, kernel, target, cw, g / w, label_smoothing, interpret
    )
    return (
        dx,
        dk.astype(kernel.dtype),
        np.zeros(target.shape, jax.dtypes.float0),
        jnp.zeros_like(cw),
    )


_fused_loss.defvjp(_fused_loss_fwd, _fused_loss_bwd)


def fused_semantic_head_loss(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    target: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    label_smoothing: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Weighted CE of the final-x2-upsampled semantic head, fused.

    x: (N, H/2, W/2, C) half-res head logits (input of the final
    'learned-3x3-zeropad' stage); kernel: (3, 3, 1, C) depthwise;
    target: (N, H, W) int in the full label space (0 = void).
    Loss value and gradients match semantic_head_loss_reference (the
    unfused train path) to bf16-rounding tolerance.
    """
    if not interpret and jax.default_backend() != "tpu":
        return semantic_head_loss_reference(
            x, kernel, target, class_weights, label_smoothing
        )
    c = x.shape[-1]
    cw = (jnp.ones((c,), jnp.float32) if class_weights is None
          else class_weights.astype(jnp.float32))
    return _fused_loss(
        float(label_smoothing), interpret, x, kernel,
        target.astype(jnp.int32), cw,
    )
