"""Cross-block fused NonBottleneck1D chain as a Pallas TPU kernel.

Round-1 roofline analysis (CLAUDE.md) showed the flagship forward is
HBM-bandwidth bound at ~14% MXU: every NBt1D block is 4 factorized convs
+ 2 norms + activations, and XLA runs each conv as its own HBM round
trip. Fusing a *single* block cannot win — XLA's per-block time is
already near the per-block read+write bound — so this kernel fuses an
entire chain of K consecutive stride-1 blocks (an encoder stage tail or
a decoder module's block stack): the feature map is read from HBM once,
K blocks run entirely in VMEM (bf16 MXU matmuls, f32 accumulation), and
the result is written once. HBM traffic drops ~K*(round trips per block)
to 2 traversals.

Structure per block (reference `get_block_class('nonbottleneck1d')`,
emsanet/model.py:49-51; SURVEY.md M2): 3x1 conv+bias, ReLU, 1x3
conv+bias, BN, ReLU, 3x1 conv+bias, ReLU, 1x3 conv+bias, BN, residual
add, ReLU. Inference-only: BN is folded to per-channel scale/shift.
The flax block (models/layers.py::NonBottleneck1D) remains the training
path and the numerics oracle.

Kernel design (see /opt/skills/guides/pallas_guide.md):
- grid over (batch * row-tiles); output rows are written through a
  blocked BlockSpec (auto-pipelined), input rows are fetched by a
  manually double-buffered async DMA because halo windows overlap.
- the input is zero-padded by HALO = 2*K rows outside the kernel, so
  every DMA window is in bounds and image-edge zero padding is exact.
- each 3x1 (vertical) conv masks out-of-image rows of its input to
  zero first, reproducing XLA's per-conv zero padding at the image
  border even after earlier blocks have written bias/BN values into
  those rows; within-tile halo rows hold real neighbor data.
- convs are einsum taps: (rows*W, C) @ (C, C) MXU matmuls with f32
  accumulation, inputs in the model compute dtype (bf16 on TPU).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# channel widths where the fused kernel BEAT XLA on the v5e at
# THROUGHPUT batch sizes (tools/chain_bench.py, b32 bf16): C=64 via
# pixel-pair merging 1.64x, C=128 1.17x. C=256 measured ~2x SLOWER at
# b32 (XLA's conv emitter reaches ~60% MXU there and the chains are
# compute- not bandwidth-bound), and C=512 weight stacks exceed VMEM —
# both stay on the XLA path at large batch. At LATENCY batch sizes the
# tensors are tiny, the graph is launch-overhead-bound (CLAUDE.md b1
# analysis: ~3 ms of inter-kernel overhead across hundreds of launches),
# and collapsing a K-block chain from ~6K kernels to 1 wins regardless
# of MXU efficiency — so C=256 is additionally enabled below a total
# spatial-size threshold (chain_supported_latency).
SUPPORTED_CHANNELS = (64, 128)
SUPPORTED_CHANNELS_LATENCY = (64, 128, 256)
# latency-mode gate: total pixels (n*h*w) at or below this take the
# fused chain even for compute-bound channel widths. DEFAULT 0 = OFF:
# the hypothesis FAILED the whole-model A/B (tools/latency_ab.py, v5e,
# one process) — standalone sites break even (C=256@30x40 K=5: 0.27 XLA
# vs 0.05 chain, rest sub-noise), but fusing all 8 b1 sites made the
# full forward WORSE: fwd 5.51 -> 6.36 ms, e2e 8.43 -> 9.14 ms. The
# per-forward weight stacking (in-graph concats/casts per chain) and
# Pallas custom-call overhead outweigh the ~140 XLA launches removed;
# XLA pipelines its small kernels better than the launch-count model
# assumed. Kept as an opt-in (set > 0) because the machinery (C=256
# resident, C=512 weight-streamed, odd-width col-padding) is exact and
# may win on other topologies/backends.
LATENCY_MAX_PIXELS = 0
# VMEM budget for picking the row-tile size (bytes); leaves headroom for
# Mosaic temporaries out of the ~16 MB per-core VMEM. Weight stacks eat
# into the total separately (_pick_tile_h): small-channel chains keep
# the full activation budget, wide latency-mode chains trade tile size
# for weight residency.
_VMEM_BUDGET = 9 * 1024 * 1024
_VMEM_TOTAL = 14 * 1024 * 1024
_WEIGHTS_MAX = 11 * 1024 * 1024
# A/B knob: force the XLA row-padded input path even where the clamped
# in-bounds DMA window (no jnp.pad round trip) is available. The clamped
# path is exact — out-of-image rows are re-zeroed at every vertical conv
# already — and removes one full read+write of the feature map per chain
# call (same trick as ops/nbt1d_train.py, which measured ~3 ms/step).
FORCE_PADDED = False


def _weight_bytes(c: int, k: int, itemsize: int = 2) -> int:
    """VMEM held by the K-block weight stack (w31+w13, biases, BN)."""
    return k * 2 * (2 * 3 * c * c + 4 * c) * itemsize


def _pick_tile_h(h: int, w: int, c: int, k: int, itemsize: int,
                 resident_weights: bool = True) -> int:
    """Largest divisor row-tile of `h` whose working set fits the budget."""
    halo = 2 * k
    best = None
    held = (
        _weight_bytes(c, k, itemsize) if resident_weights
        else 2 * 2 * 3 * c * c * itemsize  # two streamed block slots
    )
    budget = min(_VMEM_BUDGET, _VMEM_TOTAL - held)
    for tile in range(h, 0, -1):
        if h % tile:
            continue
        r = tile + 2 * halo
        row_bytes = w * c * itemsize
        # double-buffered input + double-buffered output + f32 accumulator
        # + two shifted tap copies (compute dtype)
        est = (
            2 * r * row_bytes
            + 2 * tile * row_bytes
            + r * w * c * 4
            + 2 * r * row_bytes
        )
        if est <= budget:
            best = tile
            break
    if best is None:
        best = 8 if h % 8 == 0 else 1
    return best


def _tap(x, w):
    """(R, W, C) @ (C, C) MXU matmul, f32 accumulation.

    bf16 operands (production path) use the MXU's native
    f32-accumulating mode; Mosaic rejects precision=HIGHEST for bf16
    ('Bad lhs type'). f32 operands force HIGHEST so the kernel matches
    the XLA conv oracle exactly — the default f32 MXU mode uses bf16
    passes and drifted ~4e-3 over a 3-block chain in on-device tests.
    """
    precision = (
        jax.lax.Precision.HIGHEST
        if x.dtype == jnp.float32
        else None
    )
    return jnp.einsum(
        "rwc,co->rwo", x, w,
        preferred_element_type=jnp.float32,
        precision=precision,
    )


def _conv3x1(x, w, b, mask):
    """Vertical 3-tap conv. x (R, W, C) compute dtype; w (3, C, C); b (C,).

    `mask` (R, 1, 1) zeroes out-of-image rows of the *input* first so the
    vertical taps read exact zeros at the image border (XLA SAME-pad
    semantics) regardless of what earlier blocks left in the dead rows.
    Returns f32 (R, W, C).
    """
    x = x * mask
    zero = jnp.zeros_like(x[:1])
    dn = jnp.concatenate([zero, x[:-1]], axis=0)  # x[r-1]
    up = jnp.concatenate([x[1:], zero], axis=0)   # x[r+1]
    acc = _tap(dn, w[0]) + _tap(x, w[1]) + _tap(up, w[2])
    return acc + b[None, None, :]


def _conv1x3(x, w, b, col_mask=None):
    """Horizontal 3-tap conv; zero padding at W edges is the true image
    edge (tiles span full W). `col_mask` zeroes dead padding columns of
    the input first (W gets padded up to the sublane tiling when the
    image width is not a multiple of 8 — Mosaic rejects misaligned HBM
    slices; earlier blocks leave bias/BN values in the dead columns).
    Returns f32 (R, W, C)."""
    if col_mask is not None:
        x = x * col_mask
    zero = jnp.zeros_like(x[:, :1])
    lf = jnp.concatenate([zero, x[:, :-1]], axis=1)
    rt = jnp.concatenate([x[:, 1:], zero], axis=1)
    acc = _tap(lf, w[0]) + _tap(x, w[1]) + _tap(rt, w[2])
    return acc + b[None, None, :]


def _shift_rows_by(x, d: int):
    """Shift rows of (R, W, C) by d (positive = toward row 0), zero-fill."""
    zeros = jnp.zeros_like(x[: abs(d)])
    if d > 0:
        return jnp.concatenate([x[d:], zeros], axis=0)
    return jnp.concatenate([zeros, x[:d]], axis=0)


def _chain_kernel(
    # refs
    xpad_ref,  # (N, H + 2*HALO, W, C) padded, or (N, H, W, C) clamped — HBM
    w31_ref,   # (K, 2, 3, C, C) compute dtype, VMEM (or HBM if streaming)
    b31_ref,   # (K, 2, C) f32
    w13_ref,   # (K, 2, 3, C, C)
    b13_ref,   # (K, 2, C)
    s_ref,     # (K, 2, C) folded BN scale
    t_ref,     # (K, 2, C) folded BN shift
    out_ref,   # (1, TILE, W, C) blocked
    in_buf,    # scratch (2, R, W, C)
    sems,      # DMA semaphores (2,)
    *wbufs,    # streaming only: w31_buf, w13_buf (2,3,C,C), sems_w (2,)
    n_blocks: int,
    tile_h: int,
    tiles_per_image: int,
    img_h: int,
    img_w: int,
    stream_weights: bool = False,
    padded: bool = True,
):
    halo = 2 * n_blocks
    r = tile_h + 2 * halo
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    def make_dma(step_idx, slot):
        n = step_idx // tiles_per_image
        t = step_idx % tiles_per_image
        if padded:
            start = t * tile_h
        else:
            # clamped in-bounds window on the UNPADDED input; realigned
            # below. Requires tile_h >= 2*halo and H >= tile_h + 2*halo
            # (gated in nbt1d_chain) so the shift is only ever +/-halo.
            start = jnp.clip(t * tile_h - halo, 0, img_h - r)
        return pltpu.make_async_copy(
            xpad_ref.at[n, pl.ds(start, r)],
            in_buf.at[slot],
            sems.at[slot],
        )

    @pl.when(step == 0)
    def _():
        make_dma(0, 0).start()

    @pl.when(step + 1 < n_steps)
    def _():
        make_dma(step + 1, (step + 1) % 2).start()

    make_dma(step, step % 2).wait()

    x = in_buf[step % 2]  # (R, W, C) compute dtype
    cdtype = x.dtype
    if not padded:
        # realign buf[j] = src[start + j] to x[j] = src[want + j]; with
        # tile_h >= 2*halo the shift is -halo (first tile), +halo (last
        # tile) or 0. Rows shifted in are zero-filled — by construction
        # they are out-of-image rows, which every vertical conv re-zeroes
        # anyway (mask below), so the fill value never reaches the output.
        t0 = step % tiles_per_image
        want = t0 * tile_h - halo
        shift = want - jnp.clip(want, 0, img_h - r)
        x = jnp.where(
            shift == -halo, _shift_rows_by(x, -halo),
            jnp.where(shift == halo, _shift_rows_by(x, halo), x),
        )

    if stream_weights:
        w31_buf, w13_buf, sems_w = wbufs

        def fetch_weights(k):
            # single-buffered per-block weight DMA (latency sites only:
            # the ~8 us fetch of a C=512 block is far below the launch
            # overhead the fusion removes; weight stacks this wide do
            # not fit VMEM, see _WEIGHTS_MAX)
            cp31 = pltpu.make_async_copy(
                w31_ref.at[k], w31_buf, sems_w.at[0])
            cp13 = pltpu.make_async_copy(
                w13_ref.at[k], w13_buf, sems_w.at[1])
            cp31.start()
            cp13.start()
            cp31.wait()
            cp13.wait()
            return w31_buf, w13_buf
    else:
        def fetch_weights(k):
            return w31_ref[k], w13_ref[k]

    # out-of-image row mask: global image row of local row `row` is
    # t*tile_h + row - halo; rows outside [0, img_h) are dead.
    t = step % tiles_per_image
    local = jax.lax.broadcasted_iota(jnp.int32, (r, 1, 1), 0)
    grow = t * tile_h + local - halo
    mask = jnp.logical_and(grow >= 0, grow < img_h).astype(cdtype)
    w_pad = x.shape[1]
    col_mask = None
    if img_w < w_pad:
        cidx = jax.lax.broadcasted_iota(jnp.int32, (1, w_pad, 1), 1)
        col_mask = (cidx < img_w).astype(cdtype)

    h = x
    for k in range(n_blocks):
        w31_k, w13_k = fetch_weights(k)
        y = _conv3x1(h, w31_k[0], b31_ref[k, 0], mask)
        y = jax.nn.relu(y).astype(cdtype)
        y = _conv1x3(y, w13_k[0], b13_ref[k, 0], col_mask)
        y = y * s_ref[k, 0][None, None, :] + t_ref[k, 0][None, None, :]
        y = jax.nn.relu(y).astype(cdtype)
        y = _conv3x1(y, w31_k[1], b31_ref[k, 1], mask)
        y = jax.nn.relu(y).astype(cdtype)
        y = _conv1x3(y, w13_k[1], b13_ref[k, 1], col_mask)
        y = y * s_ref[k, 1][None, None, :] + t_ref[k, 1][None, None, :]
        h = jax.nn.relu(y + h.astype(jnp.float32)).astype(cdtype)

    out_ref[0] = h[halo:halo + tile_h]


def _merge_c64(stacked: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Rewrite a C=64 chain as an exactly-equivalent C=128 chain.

    C=64 maps use only half of the 128-lane vregs (and Mosaic rejects
    64-channel DMA slices: 'slice along dim 3 must be aligned to tiling
    (128)'). Merging horizontal pixel pairs into the channel dim — x
    viewed as (N, H, W/2, 128) with merged channels [even-pixel c |
    odd-pixel c] — fixes both: full lane utilization, full 128x128 MXU
    tiles. Weights become block matrices:
      vertical 3x1: same tap per sub-pixel -> block-diag(w, w)
      horizontal 1x3: taps re-span merged columns:
        out_even[m] = w0*x_odd[m-1] + w1*x_even[m] + w2*x_odd[m]
        out_odd[m]  = w0*x_even[m]  + w1*x_odd[m]  + w2*x_even[m+1]
    Per-channel vectors (bias, folded BN) tile twice.
    """
    k2, _, _, c, _ = stacked["w31"].shape
    z = jnp.zeros_like(stacked["w31"][..., :, :])  # (K,2,3,C,C)

    def blockdiag(w):  # (..., 3, C, C) -> (..., 3, 2C, 2C)
        zz = jnp.zeros_like(w)
        top = jnp.concatenate([w, zz], axis=-1)
        bot = jnp.concatenate([zz, w], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    def merge_h(w):  # (K, 2, 3, C, C) -> (K, 2, 3, 2C, 2C)
        w0, w1, w2 = w[..., 0, :, :], w[..., 1, :, :], w[..., 2, :, :]
        zz = jnp.zeros_like(w0)
        # rows = merged input channel blocks (lo=even px, hi=odd px),
        # cols = merged output channel blocks
        prev = jnp.block([[zz, zz], [w0, zz]])
        mid = jnp.block([[w1, w0], [w2, w1]])
        nxt = jnp.block([[zz, w2], [zz, zz]])
        return jnp.stack([prev, mid, nxt], axis=-3)

    def tile2(v):  # (K, 2, C) -> (K, 2, 2C)
        return jnp.concatenate([v, v], axis=-1)

    return {
        "w31": blockdiag(stacked["w31"]),
        "b31": tile2(stacked["b31"]),
        "w13": merge_h(stacked["w13"]),
        "b13": tile2(stacked["b13"]),
        "bn_scale": tile2(stacked["bn_scale"]),
        "bn_shift": tile2(stacked["bn_shift"]),
    }


@functools.partial(
    jax.jit, static_argnames=("tile_h", "interpret", "stream_weights")
)
def nbt1d_chain(
    x: jnp.ndarray,
    stacked: Dict[str, jnp.ndarray],
    tile_h: int | None = None,
    interpret: bool = False,
    stream_weights: bool = False,
) -> jnp.ndarray:
    """Run K fused stride-1 NBt1D blocks over x.

    x: (N, H, W, C), any float dtype (bf16 on TPU).
    stacked: dict from `stack_chain_params` with
      w31 (K,2,3,C,C), b31 (K,2,C), w13 (K,2,3,C,C), b13 (K,2,C),
      bn_scale (K,2,C), bn_shift (K,2,C). Weights are cast to x.dtype
      (MXU input); biases/BN stay f32 (accumulator domain).
    stream_weights: keep the conv weights in HBM and DMA them per block
      (latency-mode C=512 chains whose weight stacks exceed VMEM; every
      grid step re-fetches, so this is only gated on for tiny grids).
    """
    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # CPU tests exercise the same code path
    n, h, w, c = x.shape
    if c == 64 and w % 2 == 0:
        merged = nbt1d_chain(
            x.reshape(n, h, w // 2, 128),
            _merge_c64(stacked),
            tile_h=tile_h,
            interpret=interpret,
        )
        return merged.reshape(n, h, w, c)
    k = stacked["w31"].shape[0]
    halo = 2 * k
    # Mosaic requires HBM slices 8-aligned on the sublane (W) dim even at
    # full extent (the logical width is padded to the (8,128) tiling);
    # odd widths (e.g. the 15x20 1/32 maps) get dead padding columns that
    # the kernel masks at each horizontal conv (col_mask).
    wp = -(-w // 8) * 8
    if tile_h is None:
        tile_h = _pick_tile_h(
            h, wp, c, k, jnp.dtype(x.dtype).itemsize,
            resident_weights=not stream_weights,
        )
    assert h % tile_h == 0, (h, tile_h)
    tiles = h // tile_h
    r = tile_h + 2 * halo

    # Clamped in-bounds DMA windows skip the jnp.pad HBM round trip (one
    # full read+write of the feature map per call). Needs: no dead
    # padding columns (the pad would have to add them), and the 3-way
    # realign invariant tile_h >= 2*halo with the window fitting in H.
    padded = FORCE_PADDED or wp != w or tile_h < 2 * halo or h < r
    if padded:
        xin = jnp.pad(x, ((0, 0), (halo, halo), (0, wp - w), (0, 0)))
    else:
        xin = x
    cdtype = x.dtype
    f32 = jnp.float32

    kernel = functools.partial(
        _chain_kernel,
        n_blocks=k,
        tile_h=tile_h,
        tiles_per_image=tiles,
        img_h=h,
        img_w=w,
        stream_weights=stream_weights,
        padded=padded,
    )
    wspace = (
        pltpu.MemorySpace.HBM if stream_weights
        else pltpu.MemorySpace.VMEM
    )
    scratch = [
        pltpu.VMEM((2, r, wp, c), cdtype),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if stream_weights:
        scratch += [
            pltpu.VMEM((2, 3, c, c), cdtype),  # w31 block slot
            pltpu.VMEM((2, 3, c, c), cdtype),  # w13 block slot
            pltpu.SemaphoreType.DMA((2,)),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(n * tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # halo DMA source
            pl.BlockSpec(memory_space=wspace),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=wspace),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, wp, c),
            lambda i: (i // tiles, i % tiles, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, wp, c), x.dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(
        xin,
        stacked["w31"].astype(cdtype),
        stacked["b31"].astype(f32),
        stacked["w13"].astype(cdtype),
        stacked["b13"].astype(f32),
        stacked["bn_scale"].astype(f32),
        stacked["bn_shift"].astype(f32),
    )
    if wp != w:
        out = out[:, :, :w]
    return out


def fold_bn(scale, bias, mean, var, eps: float = 1e-5):
    """Inference BN as per-channel affine y = x*s + t (traceable)."""
    s = scale * jax.lax.rsqrt(var + eps)
    t = bias - mean * s
    return s, t


def _second_norm(params, stats):
    """The block's second norm: 'Norm_1/BatchNorm_0' normally, or a bare
    'BatchNorm_0' for the zero-init-residual variant
    (models/layers.py::NonBottleneck1D)."""
    if "Norm_1" in params:
        return params["Norm_1"]["BatchNorm_0"], stats["Norm_1"]["BatchNorm_0"]
    return params["BatchNorm_0"], stats["BatchNorm_0"]


def stack_chain_params(
    block_params: Sequence[Dict[str, Any]],
    block_stats: Sequence[Dict[str, Any]],
) -> Dict[str, jnp.ndarray]:
    """Stack K NonBottleneck1D flax param trees into kernel inputs.

    flax conv kernels: 3x1 -> (3, 1, C, C), 1x3 -> (1, 3, C, C); both
    become (3, C_in, C_out). All ops are jnp (in-graph, tiny C-sized
    work folded per forward call).
    """
    w31, b31, w13, b13, s, t = [], [], [], [], [], []
    for params, stats in zip(block_params, block_stats):
        w31.append(jnp.stack([
            params["Conv_0"]["kernel"][:, 0],
            params["Conv_2"]["kernel"][:, 0],
        ]))
        b31.append(jnp.stack([
            params["Conv_0"]["bias"], params["Conv_2"]["bias"],
        ]))
        w13.append(jnp.stack([
            params["Conv_1"]["kernel"][0],
            params["Conv_3"]["kernel"][0],
        ]))
        b13.append(jnp.stack([
            params["Conv_1"]["bias"], params["Conv_3"]["bias"],
        ]))
        bn1p = params["Norm_0"]["BatchNorm_0"]
        bn1s = stats["Norm_0"]["BatchNorm_0"]
        bn2p, bn2s = _second_norm(params, stats)
        s1, t1 = fold_bn(bn1p["scale"], bn1p["bias"],
                         bn1s["mean"], bn1s["var"])
        s2, t2 = fold_bn(bn2p["scale"], bn2p["bias"],
                         bn2s["mean"], bn2s["var"])
        s.append(jnp.stack([s1, s2]))
        t.append(jnp.stack([t1, t2]))
    return {
        "w31": jnp.stack(w31),
        "b31": jnp.stack(b31),
        "w13": jnp.stack(w13),
        "b13": jnp.stack(b13),
        "bn_scale": jnp.stack(s),
        "bn_shift": jnp.stack(t),
    }


def _chain_shape_ok(h: int, w: int, c: int, k: int,
                    allow_col_pad: bool = False) -> bool:
    if c == 64:
        # C=64 runs as a pixel-pair-merged C=128 chain (_merge_c64)
        if w % 16 != 0:
            return False
    elif w % 8 != 0 and not allow_col_pad:
        # W rides the sublane dimension; latency-mode calls pad dead
        # columns instead (masked in-kernel), throughput calls skip —
        # their flagship shapes are aligned and the padding waste at
        # large batch is unmeasured
        return False
    # the weight stack must leave VMEM room for the activation tiles
    if _weight_bytes(max(c, 128), k) > _WEIGHTS_MAX:
        return False
    wp = -(-w // 8) * 8
    return h >= 8 and h % _pick_tile_h(h, wp, c, k, 2) == 0


def chain_supported(h: int, w: int, c: int, k: int) -> bool:
    """Whether the fused kernel handles this chain shape (throughput)."""
    if c not in SUPPORTED_CHANNELS:
        return False
    if k < 2:  # single blocks: XLA is already at the roofline
        return False
    return _chain_shape_ok(h, w, c, k)


def chain_supported_latency(n: int, h: int, w: int, c: int, k: int) -> bool:
    """Latency-mode gate: small total spatial size -> fuse wider chains.

    Below LATENCY_MAX_PIXELS the graph is launch-bound, not
    bandwidth/compute-bound, so C=256 chains (a loss at b32) win by
    collapsing ~6K kernels into one. K=1 still replaces ~6 launches.
    """
    if c not in SUPPORTED_CHANNELS_LATENCY:
        return False
    if n * h * w > LATENCY_MAX_PIXELS:
        return False
    return _chain_shape_ok(h, w, c, k, allow_col_pad=True)


def chain_stream_latency(n: int, h: int, w: int, c: int, k: int) -> bool:
    """Gate for the weight-streaming variant (latency mode, C=512).

    The C=512 weight stack never fits VMEM, so weights are DMA'd per
    block per grid step — profitable only when the grid is tiny and the
    call is launch-bound: the flagship b1 sites are decoder module0 and
    the encoder stage3 tail at 15x20. Odd widths ride the dead-column
    padding (masked in-kernel).
    """
    if c != 512:
        return False
    if n * h * w > LATENCY_MAX_PIXELS // 2:
        return False
    wp = -(-w // 8) * 8
    if wp * c * 2 > 512 * 1024:  # row fits comfortably
        return False
    return h >= 4 and h % _pick_tile_h(
        h, wp, c, k, 2, resident_weights=False) == 0
