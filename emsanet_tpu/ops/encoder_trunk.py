"""Whole-trunk encoder megakernel: stages 2-4 of BOTH backbones + fusions.

Companion to `ops/decoder_trunk.py` (same round-4 finding: the b1 forward
is dispatch-bound and only whole-graph kernel-count reduction moves it;
after the decoder megakernel the remaining XLA meat at b1 is the encoder,
~2.5 ms of a 3.9 ms forward). This kernel runs, per image, everything
between the 1/4-resolution stage-1 features and the encoder outputs:

    for stage in (2, 3, 4):          # reference R34 stages, stride 2
        for modality in (rgb, depth):
            strided NonBottleneck1D block (1x1-conv + BN shortcut)
            K-1 stride-1 NonBottleneck1D blocks
        SE fusion: rgb = SE_main(rgb) + SE_other(depth)   (se-add-uni-rgb)
        emit skip (both modalities) at 1/8 and 1/16, finals at 1/32

Reference structure: `nicr_mt_scene_analysis.model.encoder` stage-wise
dual-backbone with per-stage SE fusion (emsanet/model.py:95-106, SURVEY.md
M3); flax oracle `models/backbone.py::ResNetStage` + `models/encoder.py::
SEFusion`. BN is inference-folded; all convs are shifted-tap MXU einsums
with f32 accumulation; weights stream per conv from HBM (the stacked
dual-modality stage 2-4 weight set is ~64 MB and re-read per image, so the
kernel is gated to the latency regime like the decoder trunk).

Layout notes: stage-2 consumes the 1/4 features column-pair-merged
((N, H4, W4/2, 128), an HBM bitcast of the (..., 64) map — Mosaic rejects
64-lane DMAs); its strided convs un-merge for free (even/odd interleaved
columns are lane blocks). Later stages ride plain (H, W, C); parity
selects for stride-2 convs use leading-dim reshapes (rows) and the
contiguous (H, W, C) -> (H, W/2, 2C) lane-merge (columns) — no strided
slices, no relayouts. The 1/32 width (20) is NOT padded in VMEM (vreg
tiling handles ragged sublanes); only the final output DMA pads to 24.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from emsanet_tpu.ops.decoder_trunk import (
    _conv1x3,
    _conv3x1,
    _mm,
    _shift_cols,
    _shift_rows,
)
from emsanet_tpu.ops.nbt1d_chain import fold_bn, stack_chain_params

# latency gate — same weight-restreaming economics as the decoder trunk
MAX_BATCH = 2
_MAX_C = 512


def encoder_trunk_supported(n: int, h4: int, w4: int,
                            stage_features: Sequence[int],
                            stage_blocks: Sequence[int],
                            c_in: int = 64,
                            max_batch: int | None = None,
                            allow_unaligned: bool = False) -> bool:
    """Shape/config gate for the stage-2..4 megakernel.

    Requires the standard downsampling-32 layout (three stride-2 stages
    after the stride-1 stage 1) and TPU tiling alignment: the merged 1/4
    width and the 1/8 / 1/16 widths must be sublane-aligned.
    """
    if n > (MAX_BATCH if max_batch is None else max_batch):
        return False
    if len(stage_features) != 3 or len(stage_blocks) != 3:
        return False
    if any(k < 1 for k in stage_blocks):
        return False
    h, w = h4, w4
    for c in stage_features:
        if h % 2 or w % 2:
            return False
        h, w = h // 2, w // 2
    if allow_unaligned:
        return True
    if (2 * c_in) % 128 or any(c % 128 for c in stage_features):
        return False
    if c_in > _MAX_C or max(stage_features) > _MAX_C:
        return False
    # the merged stage-2 input width (= the 1/8 width) and the 1/16
    # width ride sublanes in HBM DMAs; the 1/32 width only appears padded
    if (w4 // 2) % 8 or (w4 // 4) % 8:
        return False
    return True


# ---------------------------------------------------------------------------
# parameter stacking (trace time)
# ---------------------------------------------------------------------------

# order of the packed per-stage f32 vectors (M, 10, C)
_VEC_KEYS = ("b0", "b1", "b2", "b3", "bn0_s", "bn0_t", "bn1_s", "bn1_t",
             "sc_s", "sc_t")


def _fold(params, stats, name):
    p = params[name]["BatchNorm_0"]
    s = stats[name]["BatchNorm_0"]
    return fold_bn(p["scale"], p["bias"], s["mean"], s["var"])


def stack_encoder_params(
    enc_params: Dict[str, Any],
    enc_stats: Dict[str, Any],
    modalities: Sequence[str],
    stage_blocks: Sequence[int],
    use_se: bool,
) -> List[Dict[str, jnp.ndarray]]:
    """Stack stage 1..3 (code indices; reference stages 2-4) params of
    both backbones + the per-stage fusions into kernel inputs.

    enc_params/enc_stats: the FusedEncoder variable trees ('rgb_stage1',
    'depth_stage1', ..., 'fusion2'...). Leading axis M = len(modalities)
    on backbone arrays, 2 (main/other) on fusion arrays.
    """
    per_stage = []
    for si, k_blocks in enumerate(stage_blocks):
        stage_i = si + 1  # code stage index
        sw31, swrest, scw, vecs = [], [], [], []
        blocks = []
        for mod in modalities:
            p = enc_params[f"{mod}_stage{stage_i}"]["block0"]
            s = enc_stats[f"{mod}_stage{stage_i}"]["block0"]
            sw31.append(p["Conv_0"]["kernel"][:, 0])        # (3, Ci, C)
            swrest.append(jnp.stack([
                p["Conv_1"]["kernel"][0],                    # (3, C, C)
                p["Conv_2"]["kernel"][:, 0],
                p["Conv_3"]["kernel"][0],
            ]))
            scw.append(p["Conv_4"]["kernel"][0, 0])          # (Ci, C)
            bn0 = _fold(p, s, "Norm_0")
            bn1 = _fold(p, s, "Norm_1")
            bn2 = _fold(p, s, "Norm_2")
            vecs.append(jnp.stack([
                p["Conv_0"]["bias"], p["Conv_1"]["bias"],
                p["Conv_2"]["bias"], p["Conv_3"]["bias"],
                bn0[0], bn0[1], bn1[0], bn1[1], bn2[0], bn2[1],
            ]))
            bp = [
                enc_params[f"{mod}_stage{stage_i}"][f"block{k}"]
                for k in range(1, k_blocks)
            ]
            bs = [
                enc_stats[f"{mod}_stage{stage_i}"][f"block{k}"]
                for k in range(1, k_blocks)
            ]
            if bp:
                blocks.append(stack_chain_params(bp, bs))
        entry = {
            "s_w31": jnp.stack(sw31),
            "s_wrest": jnp.stack(swrest),
            "sc_w": jnp.stack(scw),
            "svec": jnp.stack(vecs),
        }
        if blocks:
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
            entry.update({f"blk_{k}": v for k, v in stacked.items()})
        if use_se:
            fp = enc_params[f"fusion{stage_i + 1}"]
            w1, b1, w2, b2 = [], [], [], []
            for branch in ("se_main", "se_other"):
                w1.append(fp[branch]["Dense_0"]["kernel"])
                b1.append(fp[branch]["Dense_0"]["bias"])
                w2.append(fp[branch]["Dense_1"]["kernel"])
                b2.append(fp[branch]["Dense_1"]["bias"])
            entry.update({
                "fus_w1": jnp.stack(w1), "fus_b1": jnp.stack(b1),
                "fus_w2": jnp.stack(w2), "fus_b2": jnp.stack(b2),
            })
        per_stage.append(entry)
    return per_stage


# ---------------------------------------------------------------------------
# in-kernel pieces
# ---------------------------------------------------------------------------


def _row_parity(x):
    """(H, W, C) -> even rows (H/2, W, C), odd rows (leading-dim only)."""
    h, w, c = x.shape
    r = x.reshape(h // 2, 2, w, c)
    return r[:, 0], r[:, 1]


def _col_parity(x):
    """(H, W, C) -> even cols, odd cols via the contiguous lane merge."""
    h, w, c = x.shape
    m = x.reshape(h, w // 2, 2 * c)
    return m[..., :c], m[..., c:]


def _se_gate(x, w1, b1, w2, b2, inv_count):
    """Squeeze-excitation gate (models/layers.py::SqueezeExcitation)."""
    s = jnp.sum(x.astype(jnp.float32), axis=(0, 1)) * inv_count  # (C,)
    h1 = jax.nn.relu(
        jnp.dot(s[None, :], w1.astype(jnp.float32),
                preferred_element_type=jnp.float32) + b1[None, :]
    )
    g = jax.nn.sigmoid(
        jnp.dot(h1, w2.astype(jnp.float32),
                preferred_element_type=jnp.float32) + b2[None, :]
    )
    return x * g[0][None, None, :].astype(x.dtype)


def _stride1_blocks(x, r, m, c, n_blocks, load_w, wblk):
    """K-1 stride-1 NBt1D blocks (same math as the decoder trunk)."""
    cdtype = x.dtype
    for k in range(n_blocks - 1):
        h_res = x
        y = None
        for half in range(2):
            load_w(r["blk_w31"].at[m, k, half], wblk.at[:, :c, :c])
            src = h_res if half == 0 else y
            z = _conv3x1(src, wblk[:, :c, :c], r["blk_b31"][m, k, half])
            z = jax.nn.relu(z).astype(cdtype)
            load_w(r["blk_w13"].at[m, k, half], wblk.at[:, :c, :c])
            z = _conv1x3(z, wblk[:, :c, :c], r["blk_b13"][m, k, half])
            z = (
                z * r["blk_bn_scale"][m, k, half][None, None, :]
                + r["blk_bn_shift"][m, k, half][None, None, :]
            )
            if half == 0:
                y = jax.nn.relu(z).astype(cdtype)
            else:
                x = jax.nn.relu(
                    z + h_res.astype(jnp.float32)
                ).astype(cdtype)
    return x


def _strided_block(x, r, m, ci, c, merged_in, load_w, wblk):
    """Strided (2, 2) NonBottleneck1D block with 1x1+BN shortcut.

    x: (H, W, Ci) plain, or (H, W/2, 2Ci) column-pair-merged when
    `merged_in` (the stage-2 input bitcast). Returns (H/2, W/2, C).
    """
    cdtype = x.dtype
    vec = r["svec"]

    def v(idx):
        return vec[m, idx][None, None, :]

    # conv0: 3x1 stride (2, 1)
    re_, ro = _row_parity(x)
    load_w(r["s_w31"].at[m], wblk.at[:3, :ci, :c])
    w31 = wblk[:3, :ci, :c]
    if merged_in:
        # independent per lane block (same weights per pixel column);
        # bias+relu+cast per block bounds the f32 transients to one
        # quarter-stage accumulator at a time
        parts = []
        for sblk in range(2):
            xe = re_[..., sblk * ci:(sblk + 1) * ci]
            xo = ro[..., sblk * ci:(sblk + 1) * ci]
            acc = (
                _mm(_shift_rows(xo, -1), w31[0])
                + _mm(xe, w31[1])
                + _mm(xo, w31[2])
                + v(0)
            )
            parts.append(jax.nn.relu(acc).astype(cdtype))
        a = jnp.concatenate(parts, axis=-1)
    else:
        a = (
            _mm(_shift_rows(ro, -1), w31[0])
            + _mm(re_, w31[1])
            + _mm(ro, w31[2])
            + v(0)
        )
        a = jax.nn.relu(a).astype(cdtype)

    # conv1: 1x3 stride (1, 2); consumes interleaved columns
    load_w(r["s_wrest"].at[m, 0], wblk.at[:3, :c, :c])
    w13 = wblk[:3, :c, :c]
    if merged_in:
        ae, ao = a[..., :c], a[..., c:]
    else:
        ae, ao = _col_parity(a)
    z = (
        _mm(_shift_cols(ao, -1), w13[0])
        + _mm(ae, w13[1])
        + _mm(ao, w13[2])
        + v(1)
    )
    z = z * v(4) + v(5)  # Norm_0
    z = jax.nn.relu(z).astype(cdtype)

    # conv2 3x1 + conv3 1x3 + Norm_1 (stride 1)
    load_w(r["s_wrest"].at[m, 1], wblk.at[:3, :c, :c])
    z2 = jax.nn.relu(
        _conv3x1(z, wblk[:3, :c, :c], vec[m, 2])
    ).astype(cdtype)
    load_w(r["s_wrest"].at[m, 2], wblk.at[:3, :c, :c])
    z3 = _conv1x3(z2, wblk[:3, :c, :c], vec[m, 3])
    z3 = z3 * v(6) + v(7)  # Norm_1

    # shortcut: 1x1 stride (2, 2) + Norm_2 — reads x[2i, 2j]. sc_w is
    # VMEM-resident (a _STAGE_SMALL operand): read it directly instead
    # of a pointless VMEM->VMEM DMA bounce through wblk
    if merged_in:
        sc_in = re_[..., :ci]  # even rows, lane block 0 = even columns
    else:
        sc_in = _col_parity(re_)[0]
    sc = _mm(sc_in, r["sc_w"][m]) * v(8) + v(9)
    return jax.nn.relu(z3 + sc).astype(cdtype)


class _StageGeom:
    def __init__(self, h_in, w_in, c_in, c_out, n_blocks, merged_in):
        self.h_in, self.w_in = h_in, w_in
        self.c_in, self.c_out = c_in, c_out
        self.n_blocks = n_blocks
        self.merged_in = merged_in
        self.h_out, self.w_out = h_in // 2, w_in // 2


_STAGE_KEYS = ("s_w31", "s_wrest", "blk_w31", "blk_w13")  # HBM-streamed
_STAGE_SMALL = ("sc_w", "svec", "blk_b31", "blk_b13", "blk_bn_scale",
                "blk_bn_shift", "fus_w1", "fus_b1", "fus_w2", "fus_b2")


def _encoder_kernel(
    rgb_ref,     # (N, H4, W4/2, 2*Cin) HBM (column-pair-merged)
    depth_ref,
    *refs,
    geoms: Tuple[_StageGeom, ...],
    use_se: bool,
    w32_pad: int,
):
    n_stage = len(geoms)
    n_per = len(_STAGE_KEYS) + len(_STAGE_SMALL)
    stage_refs = [
        dict(zip(_STAGE_KEYS + _STAGE_SMALL,
                 refs[i * n_per:(i + 1) * n_per]))
        for i in range(n_stage)
    ]
    rest = refs[n_stage * n_per:]
    outs = rest[:2 * n_stage]  # per stage: (rgb_out_ref, depth_out_ref)
    in_buf, wblk, obuf, sem_in, sem_w, sem_out = rest[2 * n_stage:]

    n = pl.program_id(0)

    def load_w(src, dst):
        cp = pltpu.make_async_copy(src, dst, sem_w)
        cp.start()
        cp.wait()

    # the two 1/4 inputs share ONE buffer: each modality's stage-2 pass
    # loads its input right before consuming it (halves the input VMEM)
    feats = {"rgb": None, "depth": None}
    for i, g in enumerate(geoms):
        r = stage_refs[i]
        for m, mod in enumerate(("rgb", "depth")):
            if i == 0:
                src = rgb_ref if m == 0 else depth_ref
                cp = pltpu.make_async_copy(src.at[n], in_buf, sem_in)
                cp.start()
                cp.wait()
                x_in = in_buf[:]
            else:
                x_in = feats[mod]
            x = _strided_block(
                x_in, r, m, g.c_in, g.c_out, g.merged_in,
                load_w, wblk,
            )
            x = _stride1_blocks(
                x, r, m, g.c_out, g.n_blocks, load_w, wblk)
            feats[mod] = x
        if use_se:
            inv = 1.0 / (g.h_out * g.w_out)
            fused = _se_gate(
                feats["rgb"], r["fus_w1"][0], r["fus_b1"][0],
                r["fus_w2"][0], r["fus_b2"][0], inv,
            ) + _se_gate(
                feats["depth"], r["fus_w1"][1], r["fus_b1"][1],
                r["fus_w2"][1], r["fus_b2"][1], inv,
            )
        else:
            fused = feats["rgb"] + feats["depth"]
        feats["rgb"] = fused.astype(feats["depth"].dtype)

        # emit skips/finals via a row-chunked bounce buffer (the chunking
        # bounds the scratch; DMA alignment only constrains the last two
        # dims, which are tiling-aligned per encoder_trunk_supported)
        is_last = i == n_stage - 1
        w_emit = w32_pad if is_last else g.w_out
        chunk = min(obuf.shape[0], g.h_out)
        for m in range(2):
            val = feats["rgb"] if m == 0 else feats["depth"]
            if w_emit != g.w_out:
                val = jnp.concatenate([
                    val,
                    jnp.zeros(
                        (g.h_out, w_emit - g.w_out, g.c_out), val.dtype),
                ], axis=1)
            for r0 in range(0, g.h_out, chunk):
                rows = min(chunk, g.h_out - r0)
                obuf[:rows, :w_emit, :g.c_out] = val[r0:r0 + rows]
                cp = pltpu.make_async_copy(
                    obuf.at[:rows, :w_emit, :g.c_out],
                    outs[2 * i + m].at[n, pl.ds(r0, rows)],
                    sem_out,
                )
                cp.start()
                cp.wait()


@functools.partial(jax.jit, static_argnames=("use_se", "interpret"))
def encoder_trunk(
    rgb4: jnp.ndarray,
    depth4: jnp.ndarray,
    per_stage: Sequence[Dict[str, jnp.ndarray]],
    use_se: bool = True,
    interpret: bool = False,
):
    """Run encoder stages 2-4 (both modalities + fusions) in one call.

    rgb4/depth4: the post-stage-1 1/4-resolution features
    (N, H4, W4, C) — rgb4 is the FUSED branch (= skips[4]['rgb']).
    Returns [(rgb_8, depth_8), (rgb_16, depth_16), (rgb_32, depth_32)]
    where each rgb_* is the post-fusion tensor; rgb_32/depth_32 come
    back width-padded to the sublane tiling — slice [:w32] outside.
    """
    if not interpret and jax.default_backend() != "tpu":
        interpret = True
    n, h4, w4, c4 = rgb4.shape
    cdtype = rgb4.dtype
    f32 = jnp.float32

    stage_feats = [s["s_w31"].shape[-1] for s in per_stage]
    stage_blocks = [
        (s["blk_w31"].shape[1] + 1) if "blk_w31" in s else 1
        for s in per_stage
    ]
    geoms = []
    h, w, ci = h4, w4, c4
    for i, (c, k) in enumerate(zip(stage_feats, stage_blocks)):
        geoms.append(_StageGeom(h, w, ci, c, k, merged_in=(i == 0)))
        h, w, ci = h // 2, w // 2, c

    align = 1 if interpret else 8
    g_last = geoms[-1]
    w32_pad = -(-g_last.w_out // align) * align

    # column-pair-merge the 1/4 inputs (HBM bitcast of contiguous memory;
    # Mosaic rejects sub-128-lane DMAs)
    rgb_m = rgb4.reshape(n, h4, w4 // 2, 2 * c4)
    depth_m = depth4.reshape(n, h4, w4 // 2, 2 * c4)

    operands = [rgb_m, depth_m]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
    ]
    for s in per_stage:
        full = dict(s)
        if "blk_w31" not in full:  # single-block stage: dummy tails
            c = full["s_w31"].shape[-1]
            m_mod = full["s_w31"].shape[0]
            zeros6 = jnp.zeros((m_mod, 1, 2, 3, c, c), cdtype)
            zvec = jnp.zeros((m_mod, 1, 2, c), f32)
            full.update({
                "blk_w31": zeros6, "blk_w13": zeros6,
                "blk_b31": zvec, "blk_b13": zvec,
                "blk_bn_scale": zvec, "blk_bn_shift": zvec,
            })
        if "fus_w1" not in full:
            c = full["s_w31"].shape[-1]
            cr = max(c // 16, 1)
            full.update({
                "fus_w1": jnp.zeros((2, c, cr), cdtype),
                "fus_b1": jnp.zeros((2, cr), f32),
                "fus_w2": jnp.zeros((2, cr, c), cdtype),
                "fus_b2": jnp.zeros((2, c), f32),
            })
        for key in _STAGE_KEYS:
            operands.append(full[key].astype(cdtype))
            in_specs.append(
                pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))
        for key in _STAGE_SMALL:
            dt = cdtype if key in ("sc_w", "fus_w1", "fus_w2") else f32
            operands.append(full[key].astype(dt))
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    out_shapes = []
    for i, g in enumerate(geoms):
        wo = w32_pad if i == len(geoms) - 1 else g.w_out
        for _ in range(2):
            out_shapes.append(
                jax.ShapeDtypeStruct((n, g.h_out, wo, g.c_out), cdtype)
            )

    max_c = max(stage_feats)
    max_ci = max(g.c_in for g in geoms)
    g0 = geoms[0]
    # row-chunked bounce buffer: holds any stage's output rows (the
    # widest row is max over stages of w_emit * c_out)
    ob_h = min(8, max(g.h_out for g in geoms))
    ob_w = max(
        w32_pad if i == len(geoms) - 1 else g.w_out
        for i, g in enumerate(geoms)
    )
    ob_c = max(g.c_out for g in geoms)
    scratch = [
        pltpu.VMEM((g0.h_in, g0.w_in // 2, 2 * g0.c_in), cdtype),  # in_buf
        pltpu.VMEM((3, max(max_c, max_ci), max_c), cdtype),   # wblk
        pltpu.VMEM((ob_h, ob_w, ob_c), cdtype),               # obuf
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
        pltpu.SemaphoreType.DMA,
    ]

    kernel = functools.partial(
        _encoder_kernel,
        geoms=tuple(geoms),
        use_se=use_se,
        w32_pad=w32_pad,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
            for _ in out_shapes
        ],
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)
    result = []
    for i, g in enumerate(geoms):
        rgb_o, depth_o = outs[2 * i], outs[2 * i + 1]
        if i == len(geoms) - 1 and w32_pad != g.w_out:
            rgb_o = rgb_o[:, :, :g.w_out]
            depth_o = depth_o[:, :, :g.w_out]
        result.append((rgb_o, depth_o))
    return result
