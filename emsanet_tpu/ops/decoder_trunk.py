"""Whole-trunk decoder megakernel: all decoder modules in ONE Pallas call.

Round-3 profiling (CLAUDE.md, tools/r3_perf_probe.py) showed the b1
forward is dispatch-bound: all architectural segments sum to 2.4 ms of a
5.5 ms forward, the rest is fixed per-kernel overhead spread across
hundreds of tiny launches. Fusing single chains was measured a LOSS at b1
(tools/latency_ab.py: the ~140 launches removed did not pay for 8 Pallas
custom calls), so the round-4 conclusion was: fewer, BIGGER kernels.

This kernel runs the ENTIRE dense-decoder trunk — for EVERY decoder — as
one `pallas_call`: per decoder module (reference decoder structure,
`nicr_mt_scene_analysis.model.decoder`, SURVEY.md M5; flax oracle
`models/decoder.py::DecoderModule`):

    conv_in 3x3 (+folded BN, ReLU)
    K NonBottleneck1D blocks           (stride 1, folded BN, ReLU)
    learned-3x3-zeropad x2 upsample    (exact polyphase form)
    encoder skip fusion                (1x1 projection + folded BN + add)

for three modules (512/256/128 channels at 1/32 -> 1/4), with a grid over
(decoder, image). The semantic and instance (and normal) decoders share
one launch; their weights are stacked with a leading decoder axis and
DMA-streamed per conv from HBM (the full stack exceeds VMEM).

Everything stays in VMEM between ops; HBM traffic is one read of the
context/skip inputs, one read of the weights, one write of the trunk
output — the same floor XLA pays, minus ~150 launches of fixed overhead
per decoder pair.

Layout notes (see /opt/skills/guides/pallas_guide.md and CLAUDE.md):
- feature maps ride (H, W, C): W on sublanes (8-aligned; the 1/32 width
  20 is padded to 24 with in-kernel dead-column masks, all later widths
  40/80/160 are already aligned), C on lanes.
- convs are shifted-tap einsums (rows*W, C) @ (C, C) on the MXU with f32
  accumulation; row/col zero-shifts reproduce SAME zero padding exactly
  (whole image is resident — no halo logic needed, unlike nbt1d_chain).
- the x2 upsample computes the 4 polyphase parity planes (exact identity,
  ops/polyphase_upsample.py) and interleaves them in VMEM: columns via a
  lane-concat + (H, W, 2C) -> (H, 2W, C) reshape (memory-contiguous),
  rows via a leading-dim stack (layout-free).
- skips are passed column-pair-merged ((N, 2H, W, 2C), an HBM bitcast)
  so every DMA has >=128 lanes; the projection runs per column block and
  re-interleaves.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emsanet_tpu.ops.nbt1d_chain import fold_bn, stack_chain_params

# largest-module tap buffers (see _DMA buffers in `decoder_trunk`)
_MAX_C = 512
# batch gate: the megakernel targets the dispatch-bound latency regime.
# The kernel streams the full weight stack per (decoder, image) grid step,
# so its weight traffic scales with batch while XLA reads weights once —
# measured on v5e (tools/trunk_ab.py, one process, 640x480 bf16):
#   b1: fwd 4.05 -> 3.90 ms (+3.6%), e2e 6.07 -> 5.93 ms (+2.3%)  WIN
#   b8: fwd 14.45 -> 15.07 ms (-4.3%)                             LOSS
MAX_BATCH = 2


# ---------------------------------------------------------------------------
# polyphase tap table (exact identity with nearest-x2 + SAME depthwise 3x3;
# see ops/polyphase_upsample.py for the derivation)
# ---------------------------------------------------------------------------

# single source of truth for the exactness-critical tap table
from emsanet_tpu.ops.polyphase_upsample import _PARITY_MAP  # noqa: E402

# static nonzero (di, dj) taps per parity (p, q): 5 of 9 are structural
# zeros (kernel-domain finding, CLAUDE.md round-3 session-3)
_PARITY_TAPS = {
    (p, q): [
        (di, dj)
        for di in range(3)
        for dj in range(3)
        if _PARITY_MAP[p, di].any() and _PARITY_MAP[q, dj].any()
        and np.einsum("a,b->ab", _PARITY_MAP[p, di], _PARITY_MAP[q, dj]).any()
    ]
    for p in range(2)
    for q in range(2)
}


def polyphase_taps(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 1, C) depthwise kernel -> (2, 2, 3, 3, C) parity tap table."""
    m = jnp.asarray(_PARITY_MAP, jnp.float32)
    k = kernel.astype(jnp.float32)[:, :, 0, :]
    return jnp.einsum("pia,qjb,abc->pqijc", m, m, k)


# ---------------------------------------------------------------------------
# in-kernel math helpers (whole-image residency: zero shifts ARE the
# SAME-pad border)
# ---------------------------------------------------------------------------


def _mm(x, w):
    """(H, W, Ci) @ (Ci, Co) MXU matmul with f32 accumulation."""
    precision = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    )
    return jnp.einsum(
        "hwc,co->hwo", x, w,
        preferred_element_type=jnp.float32, precision=precision,
    )


def _shift_rows(x, d: int):
    """Shift (H, W, C) rows by d (d>0: row r reads source r+d), zero fill."""
    if d == 0:
        return x
    z = jnp.zeros_like(x[: abs(d)])
    if d > 0:
        return jnp.concatenate([x[d:], z], axis=0)
    return jnp.concatenate([z, x[:d]], axis=0)


def _shift_cols(x, d: int):
    """Shift (H, W, C) columns by d (d>0: col j reads source j+d)."""
    if d == 0:
        return x
    z = jnp.zeros_like(x[:, : abs(d)])
    if d > 0:
        return jnp.concatenate([x[:, d:], z], axis=1)
    return jnp.concatenate([z, x[:, :d]], axis=1)


def _conv3x3(x, w_taps, col_mask=None):
    """3x3 SAME conv via 9 shifted taps.

    x: (H, W, Ci) compute dtype. w_taps: callable (u, v) -> (Ci, Co)
    returning the tap matrix for kernel position (u, v) in {0,1,2}^2
    (tap (u, v) multiplies input pixel (h+u-1, w+v-1)). Returns f32.
    """
    if col_mask is not None:
        x = x * col_mask
    acc = None
    for u in range(3):
        xr = _shift_rows(x, u - 1)
        for v in range(3):
            t = _mm(_shift_cols(xr, v - 1), w_taps(u, v))
            acc = t if acc is None else acc + t
    return acc


def _conv3x1(x, w, b, col_mask=None):
    """Vertical 3-tap conv + bias; w (3, C, C), b (C,). Returns f32."""
    del col_mask  # row shifts never cross dead columns
    acc = (
        _mm(_shift_rows(x, -1), w[0])
        + _mm(x, w[1])
        + _mm(_shift_rows(x, 1), w[2])
    )
    return acc + b[None, None, :]


def _conv1x3(x, w, b, col_mask=None):
    """Horizontal 3-tap conv + bias; dead input columns zeroed first."""
    if col_mask is not None:
        x = x * col_mask
    acc = (
        _mm(_shift_cols(x, -1), w[0])
        + _mm(x, w[1])
        + _mm(_shift_cols(x, 1), w[2])
    )
    return acc + b[None, None, :]


def _cols_interleave(a, b):
    """Interleave columns of two (H, W, C) maps -> (H, 2W, C).

    out[:, 2j] = a[:, j], out[:, 2j+1] = b[:, j]. The lane-concat makes
    the pair (a_j | b_j) adjacent in memory; the reshape splits it into
    two consecutive columns (row-major (W, 2C) == (2W, C)).
    """
    h, w, c = a.shape
    return jnp.concatenate([a, b], axis=-1).reshape(h, 2 * w, c)


def _rows_interleave(a, b):
    """Interleave rows of two (H, W, C) maps -> (2H, W, C) (leading dims)."""
    h, w, c = a.shape
    return jnp.stack([a, b], axis=1).reshape(2 * h, w, c)


# ---------------------------------------------------------------------------
# static per-module geometry
# ---------------------------------------------------------------------------


class _ModuleGeom:
    """Static shapes of one decoder module inside the kernel."""

    def __init__(self, h: int, w_valid: int, c_in: int, c_out: int,
                 c_skip: int, n_blocks: int, align: int = 8):
        self.h = h
        self.w_valid = w_valid
        self.w_pad = -(-w_valid // align) * align
        self.c_in = c_in
        self.c_out = c_out
        self.c_skip = c_skip
        self.n_blocks = n_blocks
        # upsampled output, sliced back to the valid region (must be
        # sublane-aligned so later modules run mask-free)
        self.h_out = 2 * h
        self.w_out = 2 * w_valid

    @property
    def masked(self) -> bool:
        return self.w_pad != self.w_valid


def _module_geoms(h0: int, w0: int, n_channels: Sequence[int],
                  c_context: int, skip_channels: Sequence[int],
                  n_blocks: int, align: int = 8) -> List[_ModuleGeom]:
    geoms = []
    h, w, c_in = h0, w0, c_context
    for c_out, c_skip in zip(n_channels, skip_channels):
        g = _ModuleGeom(h, w, c_in, c_out, c_skip, n_blocks, align=align)
        geoms.append(g)
        h, w, c_in = g.h_out, g.w_out, c_out
    return geoms


def trunk_supported(n: int, h0: int, w0: int,
                    n_channels: Sequence[int],
                    c_context: int,
                    skip_channels: Sequence[int],
                    n_blocks: int,
                    max_batch: int | None = None,
                    allow_unaligned: bool = False) -> bool:
    """Whether the megakernel handles this trunk configuration.

    Latency-regime gate (batch <= MAX_BATCH) + shape constraints: all
    post-module widths must be sublane-aligned (only the first module may
    carry dead padding columns), channels must fill the 128-lane vregs,
    and the weight working set per conv must fit the fixed DMA buffers.
    `allow_unaligned` skips the TPU tiling constraints (interpret-mode
    tests on CPU).
    """
    if n > (MAX_BATCH if max_batch is None else max_batch):
        return False
    if len(n_channels) != len(skip_channels):
        return False
    geoms = _module_geoms(h0, w0, n_channels, c_context, skip_channels,
                          n_blocks)
    for i, g in enumerate(geoms):
        if g.h < 2 or g.n_blocks < 1:
            return False
        if allow_unaligned:
            continue
        if i > 0 and g.masked:
            return False  # only module0 masks dead columns
        if g.w_out % 8:
            return False
        if g.c_in > _MAX_C or g.c_out > _MAX_C or g.c_skip > _MAX_C // 2:
            return False
        if g.c_in % 128 or g.c_out % 128:
            return False
        if (2 * g.c_skip) % 128:
            return False
    return True


# ---------------------------------------------------------------------------
# parameter stacking (trace-time, in-graph: measured ~free, CLAUDE.md
# round-4 fused-params-cache A/B)
# ---------------------------------------------------------------------------


def stack_trunk_params(
    decoder_params: Sequence[Dict[str, Any]],
    decoder_stats: Sequence[Dict[str, Any]],
    n_modules: int,
    n_blocks: int,
) -> List[Dict[str, jnp.ndarray]]:
    """Stack D decoders' trunk params into per-module kernel inputs.

    decoder_params[d]: the flax param tree of one DenseDecoder
    (`models/decoder.py`): module{i}/{conv_in,block{k},upsample,
    skip_fusion}. Returns one dict per module with every array carrying a
    leading decoder axis D.
    """
    per_module = []
    for i in range(n_modules):
        cin_w, cin_s, cin_t = [], [], []
        blocks, ups, proj_w, proj_s, proj_t = [], [], [], [], []
        for params, stats in zip(decoder_params, decoder_stats):
            m = params[f"module{i}"]
            ms = stats[f"module{i}"]
            # conv_in: ConvNormAct = Conv_0 + Norm_0/BatchNorm_0
            ci = m["conv_in"]
            cis = ms["conv_in"]
            s, t = fold_bn(
                ci["Norm_0"]["BatchNorm_0"]["scale"],
                ci["Norm_0"]["BatchNorm_0"]["bias"],
                cis["Norm_0"]["BatchNorm_0"]["mean"],
                cis["Norm_0"]["BatchNorm_0"]["var"],
            )
            cin_w.append(ci["Conv_0"]["kernel"])  # (3, 3, Ci, Co)
            cin_s.append(s)
            cin_t.append(t)
            blocks.append(stack_chain_params(
                [m[f"block{k}"] for k in range(n_blocks)],
                [ms[f"block{k}"] for k in range(n_blocks)],
            ))
            ups.append(polyphase_taps(m["upsample"]["depthwise"]["kernel"]))
            sf = m["skip_fusion"]
            sfs = ms["skip_fusion"]
            ps, pt = fold_bn(
                sf["Norm_0"]["BatchNorm_0"]["scale"],
                sf["Norm_0"]["BatchNorm_0"]["bias"],
                sfs["Norm_0"]["BatchNorm_0"]["mean"],
                sfs["Norm_0"]["BatchNorm_0"]["var"],
            )
            proj_w.append(sf["proj"]["kernel"][0, 0])  # (Cs, Co)
            proj_s.append(ps)
            proj_t.append(pt)
        stacked_blocks = jax.tree.map(
            lambda *xs: jnp.stack(xs), *blocks
        )
        per_module.append({
            "cin_w": jnp.stack(cin_w),
            "cin_s": jnp.stack(cin_s),
            "cin_t": jnp.stack(cin_t),
            **{f"blk_{k}": v for k, v in stacked_blocks.items()},
            "ups_k": jnp.stack(ups),
            "proj_w": jnp.stack(proj_w),
            "proj_s": jnp.stack(proj_s),
            "proj_t": jnp.stack(proj_t),
        })
    return per_module


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

# operand order per module (big = HBM-streamed, small = VMEM-resident)
_BIG_KEYS = ("cin_w", "blk_w31", "blk_w13")
_SMALL_KEYS = ("cin_s", "cin_t", "blk_b31", "blk_b13", "blk_bn_scale",
               "blk_bn_shift", "ups_k", "proj_w", "proj_s", "proj_t")


def _trunk_kernel(
    ctx_ref,        # (N, H0, W0p, C0) HBM
    *refs,
    geoms: Tuple[_ModuleGeom, ...],
    n_images: int,
    skip_chunk_rows: int = 16,
):
    """One grid step = one (decoder, image) pair: the full trunk."""
    n_mod = len(geoms)
    skip_refs = refs[:n_mod]
    flat = refs[n_mod:]
    n_per = len(_BIG_KEYS) + len(_SMALL_KEYS)
    mod_refs = [
        dict(zip(_BIG_KEYS + _SMALL_KEYS, flat[i * n_per:(i + 1) * n_per]))
        for i in range(n_mod)
    ]
    rest = flat[n_mod * n_per:]
    out_ref, xin_buf, sbuf_list, wbuf33, wblk, obuf, sem_in, sem_w, sem_out = (
        rest[0], rest[1], rest[2:2 + n_mod], rest[2 + n_mod],
        rest[3 + n_mod], rest[4 + n_mod], rest[5 + n_mod],
        rest[6 + n_mod], rest[7 + n_mod],
    )

    step = pl.program_id(0)
    d = step // n_images
    n = step % n_images

    # ---- load context input ------------------------------------------
    cp = pltpu.make_async_copy(ctx_ref.at[n], xin_buf, sem_in)
    cp.start()
    cp.wait()
    x = xin_buf[:]
    cdtype = x.dtype

    def load_w(src, dst):
        cp = pltpu.make_async_copy(src, dst, sem_w)
        cp.start()
        cp.wait()

    for i, g in enumerate(geoms):
        assert i == 0 or not g.masked, (
            "only module0 may carry dead padding columns (trunk_supported)"
        )
        r = mod_refs[i]
        col_mask = None
        if g.masked:
            cidx = jax.lax.broadcasted_iota(
                jnp.int32, (1, g.w_pad, 1), 1)
            col_mask = (cidx < g.w_valid).astype(cdtype)

        # ---- conv_in 3x3 + BN + ReLU (Cout halves when wide) ----------
        co_chunk = min(g.c_out, wbuf33.shape[-1])
        acc_parts = []
        for co0 in range(0, g.c_out, co_chunk):
            load_w(
                r["cin_w"].at[d, :, :, :, co0:co0 + co_chunk],
                wbuf33.at[:, :, :g.c_in, :co_chunk],
            )
            wv = wbuf33[:, :, :g.c_in, :co_chunk]
            acc_parts.append(
                _conv3x3(x, lambda u, v: wv[u, v], col_mask=col_mask)
            )
        acc = (
            acc_parts[0] if len(acc_parts) == 1
            else jnp.concatenate(acc_parts, axis=-1)
        )
        s = r["cin_s"][d][None, None, :]
        t = r["cin_t"][d][None, None, :]
        x = jax.nn.relu(acc * s + t).astype(cdtype)

        # ---- K NonBottleneck1D blocks ---------------------------------
        c = g.c_out
        for k in range(g.n_blocks):
            h_res = x
            y = None
            for half in range(2):
                load_w(r["blk_w31"].at[d, k, half], wblk.at[:, :c, :c])
                src = h_res if half == 0 else y
                z = _conv3x1(src, wblk[:, :c, :c],
                             r["blk_b31"][d, k, half])
                z = jax.nn.relu(z).astype(cdtype)
                load_w(r["blk_w13"].at[d, k, half], wblk.at[:, :c, :c])
                z = _conv1x3(z, wblk[:, :c, :c],
                             r["blk_b13"][d, k, half], col_mask=col_mask)
                z = (
                    z * r["blk_bn_scale"][d, k, half][None, None, :]
                    + r["blk_bn_shift"][d, k, half][None, None, :]
                )
                if half == 0:
                    y = jax.nn.relu(z).astype(cdtype)
                else:
                    x = jax.nn.relu(
                        z + h_res.astype(jnp.float32)
                    ).astype(cdtype)

        # ---- polyphase x2 upsample -> 4 parity planes ------------------
        if col_mask is not None:
            x = x * col_mask
        planes = {}
        for p in range(2):
            for q in range(2):
                acc = None
                for di, dj in _PARITY_TAPS[(p, q)]:
                    coef = r["ups_k"][d, p, q, di, dj][None, None, :]
                    tap = _shift_cols(_shift_rows(x, di - 1), dj - 1)
                    tap = tap.astype(jnp.float32) * coef
                    acc = tap if acc is None else acc + tap
                planes[(p, q)] = acc.astype(cdtype)

        # ---- interleave + skip projection + add, row-chunked -----------
        # (chunking bounds the f32 accumulators; module outputs at 1/4
        #  reach (120, 160, 128))
        sbuf = sbuf_list[i]
        half_rows = g.h  # plane rows
        chunk = min(skip_chunk_rows, half_rows)
        next_x_chunks = []
        is_last = i == len(geoms) - 1
        for r0 in range(0, half_rows, chunk):
            rows = min(chunk, half_rows - r0)
            a = _cols_interleave(
                planes[(0, 0)][r0:r0 + rows], planes[(0, 1)][r0:r0 + rows]
            )
            b = _cols_interleave(
                planes[(1, 0)][r0:r0 + rows], planes[(1, 1)][r0:r0 + rows]
            )
            y = _rows_interleave(a, b)  # (2*rows, 2*w_pad, C)
            y = y[:, : g.w_out]
            # skip chunk: merged layout (2H, W, 2Cs)
            cp = pltpu.make_async_copy(
                skip_refs[i].at[n, pl.ds(2 * r0, 2 * rows)],
                sbuf.at[pl.ds(0, 2 * rows)],
                sem_in,
            )
            cp.start()
            cp.wait()
            sk = sbuf[: 2 * rows]
            cs = g.c_skip
            pw = r["proj_w"][d]
            pe = _mm(sk[..., :cs], pw)
            po = _mm(sk[..., cs:], pw)
            ps = r["proj_s"][d][None, None, :]
            pt = r["proj_t"][d][None, None, :]
            proj = _cols_interleave(
                (pe * ps + pt).astype(cdtype),
                (po * ps + pt).astype(cdtype),
            )[:, : g.w_out]
            yc = (y.astype(jnp.float32) + proj.astype(jnp.float32)).astype(
                cdtype
            )
            if is_last:
                obuf[: 2 * rows] = yc
                cp = pltpu.make_async_copy(
                    obuf.at[pl.ds(0, 2 * rows)],
                    out_ref.at[d, n, pl.ds(2 * r0, 2 * rows)],
                    sem_out,
                )
                cp.start()
                cp.wait()
            else:
                next_x_chunks.append(yc)
        if not is_last:
            x = jnp.concatenate(next_x_chunks, axis=0)


@functools.partial(
    jax.jit, static_argnames=("interpret", "sublane_align")
)
def decoder_trunk(
    con_out: jnp.ndarray,
    skips: Sequence[jnp.ndarray],
    per_module: Sequence[Dict[str, jnp.ndarray]],
    interpret: bool = False,
    sublane_align: int | None = None,
) -> jnp.ndarray:
    """Run the full decoder trunk for D decoders in one Pallas call.

    con_out: (N, H0, W0, C0) context output (1/32).
    skips: per module, the fused encoder skip (N, 2^i*2*H0, ..., Cs)
      in NHWC (the modality-selected tensor, e.g. skips[16]['rgb']).
    per_module: from `stack_trunk_params` (leading decoder axis D).
    Returns (D, N, H_final, W_final, C_final) trunk features (the input
    to each decoder's task head).
    """
    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # CPU tests run the same code path
    n, h0, w0, c0 = con_out.shape
    d_dec = per_module[0]["cin_w"].shape[0]
    n_blocks = per_module[0]["blk_w31"].shape[1]
    n_channels = [m["cin_w"].shape[-1] for m in per_module]
    skip_channels = [s.shape[-1] for s in skips]
    align = sublane_align if sublane_align else (1 if interpret else 8)
    geoms = _module_geoms(h0, w0, n_channels, c0, skip_channels, n_blocks,
                          align=align)

    cdtype = con_out.dtype
    f32 = jnp.float32

    # pad the context width to the sublane tiling (dead cols masked)
    g0 = geoms[0]
    ctx = con_out
    if g0.w_pad != w0:
        ctx = jnp.pad(ctx, ((0, 0), (0, 0), (0, g0.w_pad - w0), (0, 0)))

    # skips: bitcast to column-pair-merged (N, 2H, W, 2Cs) and pad W to
    # the module's padded width (the kernel slices the dead columns off
    # after the projection interleave)
    skips_m = []
    for g, s in zip(geoms, skips):
        sn, sh, sw, sc = s.shape
        sm = s.reshape(sn, sh, sw // 2, 2 * sc)
        if g.w_pad != g.w_valid:
            sm = jnp.pad(
                sm, ((0, 0), (0, 0), (0, g.w_pad - g.w_valid), (0, 0))
            )
        skips_m.append(sm.astype(cdtype))

    operands = [ctx.astype(cdtype)]
    in_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)]
    for sm in skips_m:
        operands.append(sm)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))
    for m in per_module:
        big = {
            "cin_w": m["cin_w"].astype(cdtype),
            "blk_w31": m["blk_w31"].astype(cdtype),
            "blk_w13": m["blk_w13"].astype(cdtype),
        }
        small = {
            "cin_s": m["cin_s"].astype(f32),
            "cin_t": m["cin_t"].astype(f32),
            "blk_b31": m["blk_b31"].astype(f32),
            "blk_b13": m["blk_b13"].astype(f32),
            "blk_bn_scale": m["blk_bn_scale"].astype(f32),
            "blk_bn_shift": m["blk_bn_shift"].astype(f32),
            "ups_k": m["ups_k"].astype(f32),
            "proj_w": m["proj_w"].astype(cdtype),
            "proj_s": m["proj_s"].astype(f32),
            "proj_t": m["proj_t"].astype(f32),
        }
        for key in _BIG_KEYS:
            operands.append(big[key])
            in_specs.append(
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))
        for key in _SMALL_KEYS:
            operands.append(small[key])
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    g_last = geoms[-1]
    out_shape = jax.ShapeDtypeStruct(
        (d_dec, n, g_last.h_out, g_last.w_out, g_last.c_out), cdtype
    )

    skip_chunk_rows = 8  # 16 exceeded the 16 MB scoped-vmem limit by ~1 MB
    max_ci = max(g.c_in for g in geoms)
    max_co = max(g.c_out for g in geoms)
    # conv_in tap buffer: wide modules stream the output channels in
    # chunks (512 -> 2x256 keeps the buffer at 2.4 MB)
    wb_lanes = min(max_co, _MAX_C // 2)
    assert all(
        g.c_out <= wb_lanes or g.c_out % wb_lanes == 0 for g in geoms
    ), [g.c_out for g in geoms]
    scratch = [
        pltpu.VMEM((g0.h, g0.w_pad, c0), cdtype),  # xin_buf
    ]
    for g in geoms:
        scratch.append(
            pltpu.VMEM((2 * skip_chunk_rows, g.w_pad, 2 * g.c_skip), cdtype)
        )
    scratch += [
        pltpu.VMEM((3, 3, max_ci, wb_lanes), cdtype),      # wbuf33
        pltpu.VMEM((3, max_co, max_co), cdtype),           # wblk
        pltpu.VMEM((2 * skip_chunk_rows, g_last.w_out, g_last.c_out),
                   cdtype),                                # obuf
        pltpu.SemaphoreType.DMA,                           # sem_in
        pltpu.SemaphoreType.DMA,                           # sem_w
        pltpu.SemaphoreType.DMA,                           # sem_out
    ]

    kernel = functools.partial(
        _trunk_kernel,
        geoms=tuple(geoms),
        n_images=n,
        skip_chunk_rows=skip_chunk_rows,
    )
    return pl.pallas_call(
        kernel,
        grid=(d_dec * n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)
