"""Packed dual-stream encoder forward (inference-only execution path).

The flagship dual encoder runs two topologically identical ResNet-NBt1D
backbones (RGB + depth) stage-by-stage with SE fusion between stages
(models/encoder.py; reference encoder assembly emsanet/model.py:95-106).
At inference on TPU this doubles the kernel-launch count for no
arithmetic benefit: every conv is launched once per stream, and the b1
forward is dispatch-bound (CLAUDE.md b1 analysis: all architectural
segments sum to 2.4 ms of a 5.5 ms forward — the rest is inter-kernel
overhead across hundreds of launches).

This module executes BOTH streams as ONE packed stream: activations are
concatenated on the channel axis ([rgb | depth]) and every conv runs with
``feature_group_count=2`` using block-stacked kernels, so a single launch
advances both streams with zero wasted FLOPs. Inference BatchNorm folds
to per-channel affines, which pack by concatenation. The SE-fusion gates
pack as block-diagonal dense layers. Stride-1 NBt1D stage tails run as
ONE packed Pallas chain kernel where the per-stream width allows
(C=64 streams -> one C=128-dense block-diagonal chain: the exact same
MXU cost the per-stream pixel-pair merge already paid, see
ops/nbt1d_chain.py::_merge_c64) and as per-stream chain calls on channel
slices otherwise (dense 2C=256 chains would double real FLOPs).

Parameters are read from the UNCHANGED per-stream param tree — packing is
a trace-time view (same pattern as ops/nbt1d_chain.stack_chain_params),
so checkpoints are interchangeable and the flax per-stream path remains
the numerics oracle (tests/test_packed_encoder.py).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from emsanet_tpu.models.layers import get_activation_fn
from emsanet_tpu.ops.nbt1d_chain import (
    _second_norm,
    chain_supported,
    fold_bn,
    nbt1d_chain,
    stack_chain_params,
)

_DN = ("NHWC", "HWIO", "NHWC")


def packed_encoder_eligible(enc, train: bool, deterministic: bool) -> bool:
    """Whether the packed execution path applies to this encoder call.

    Requires the dual rgb+depth topology with identical backbone specs,
    NBt1D blocks (no per-block SE, no bottleneck), batchnorm, and an
    active fusion mode — i.e. the flagship family. Training and
    initialization always take the per-stream flax path.
    """
    cfg = enc.cfg
    return (
        getattr(cfg, "packed_dual_encoder", False)
        and not train
        and deterministic
        and not enc.is_initializing()
        and set(enc.specs) == {"rgb", "depth"}
        and enc.specs["rgb"] == enc.specs["depth"]
        and not enc.specs["rgb"].se
        and not enc.specs["rgb"].bottleneck
        and cfg.rgb_encoder_backbone_block == "nonbottleneck1d"
        and cfg.depth_encoder_backbone_block == "nonbottleneck1d"
        and cfg.encoder_normalization == "batchnorm"
        and enc._fuse_into is not None
    )


def _affine(params: Dict, stats: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Folded inference-BN affine of a `Norm` wrapper subtree."""
    p, s = params["BatchNorm_0"], stats["BatchNorm_0"]
    return fold_bn(p["scale"], p["bias"], s["mean"], s["var"])


def _gconv(x, k_rgb, k_d, strides=(1, 1), bias=None, dtype=jnp.float32):
    """One grouped conv advancing both streams.

    Kernels (kh, kw, C, C) per stream stack on the output-channel axis:
    XLA's feature_group_count=2 routes input group g (channels [gC, gC+C))
    through kernel output slice [gC, gC+C) — exactly the two independent
    per-stream convs, one launch, no wasted FLOPs.
    """
    k = jnp.concatenate([k_rgb, k_d], axis=-1).astype(dtype)
    kh, kw = k.shape[:2]
    pad = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    y = jax.lax.conv_general_dilated(
        x, k, strides, pad, dimension_numbers=_DN, feature_group_count=2
    )
    if bias is not None:
        y = y + bias.astype(dtype)[None, None, None, :]
    return y


def _packed_stem(inputs, p, s, dtype, activation):
    """Both 7x7/2 stems as one dense conv on 4 packed input channels.

    The rgb kernel reads input channels 0:3 -> outputs 0:C; the depth
    kernel reads channel 3 -> outputs C:2C; cross blocks are exact
    zeros. Dense (not grouped: 3 vs 1 input channels can't split into
    equal groups) — the doubled stem MACs are noise next to the launch
    saved, and the zero blocks are structural.
    """
    k_rgb = p["rgb_stem"]["Conv_0"]["kernel"]    # (7,7,3,C)
    k_d = p["depth_stem"]["Conv_0"]["kernel"]    # (7,7,1,C)
    c = k_rgb.shape[-1]
    k = jnp.zeros((7, 7, 4, 2 * c), k_rgb.dtype)
    k = k.at[:, :, :3, :c].set(k_rgb)
    k = k.at[:, :, 3:, c:].set(k_d)
    x = jnp.concatenate(
        [inputs["rgb"].astype(dtype), inputs["depth"].astype(dtype)], axis=-1
    )
    y = jax.lax.conv_general_dilated(
        x, k.astype(dtype), (2, 2), [(3, 3), (3, 3)], dimension_numbers=_DN
    )
    sc_r, sh_r = _affine(p["rgb_stem"]["Norm_0"], s["rgb_stem"]["Norm_0"])
    sc_d, sh_d = _affine(p["depth_stem"]["Norm_0"], s["depth_stem"]["Norm_0"])
    y = y.astype(jnp.float32) * jnp.concatenate([sc_r, sc_d]) + jnp.concatenate(
        [sh_r, sh_d]
    )
    y = get_activation_fn(activation)(y).astype(dtype)
    return nn.max_pool(
        y, window_shape=(3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
    )


def _packed_block(x, bp_r, bs_r, bp_d, bs_d, features, stride, dtype, act):
    """One NBt1D block over the packed stream (grouped convs, folded BN).

    Mirrors models/layers.py::NonBottleneck1D at inference; dropout is a
    no-op there. Encoder blocks are never zero-init-residual, but the
    second-norm lookup handles both naming variants via `_second_norm`.
    """
    h = _gconv(
        x,
        bp_r["Conv_0"]["kernel"], bp_d["Conv_0"]["kernel"],
        strides=(stride, 1),
        bias=jnp.concatenate([bp_r["Conv_0"]["bias"], bp_d["Conv_0"]["bias"]]),
        dtype=dtype,
    )
    h = act(h)
    h = _gconv(
        h,
        bp_r["Conv_1"]["kernel"], bp_d["Conv_1"]["kernel"],
        strides=(1, stride),
        bias=jnp.concatenate([bp_r["Conv_1"]["bias"], bp_d["Conv_1"]["bias"]]),
        dtype=dtype,
    )
    sc_r, sh_r = _affine(bp_r["Norm_0"], bs_r["Norm_0"])
    sc_d, sh_d = _affine(bp_d["Norm_0"], bs_d["Norm_0"])
    h = h.astype(jnp.float32) * jnp.concatenate([sc_r, sc_d]) + jnp.concatenate(
        [sh_r, sh_d]
    )
    h = act(h).astype(dtype)

    h = _gconv(
        h,
        bp_r["Conv_2"]["kernel"], bp_d["Conv_2"]["kernel"],
        bias=jnp.concatenate([bp_r["Conv_2"]["bias"], bp_d["Conv_2"]["bias"]]),
        dtype=dtype,
    )
    h = act(h)
    h = _gconv(
        h,
        bp_r["Conv_3"]["kernel"], bp_d["Conv_3"]["kernel"],
        bias=jnp.concatenate([bp_r["Conv_3"]["bias"], bp_d["Conv_3"]["bias"]]),
        dtype=dtype,
    )
    n2p_r, n2s_r = _second_norm(bp_r, bs_r)
    n2p_d, n2s_d = _second_norm(bp_d, bs_d)
    sc_r, sh_r = fold_bn(n2p_r["scale"], n2p_r["bias"],
                         n2s_r["mean"], n2s_r["var"])
    sc_d, sh_d = fold_bn(n2p_d["scale"], n2p_d["bias"],
                         n2s_d["mean"], n2s_d["var"])
    h = h.astype(jnp.float32) * jnp.concatenate([sc_r, sc_d]) + jnp.concatenate(
        [sh_r, sh_d]
    )

    residual = x
    if stride != 1 or x.shape[-1] != 2 * features:
        residual = _gconv(
            x, bp_r["Conv_4"]["kernel"], bp_d["Conv_4"]["kernel"],
            strides=(stride, stride), dtype=dtype,
        )
        sc_r, sh_r = _affine(bp_r["Norm_2"], bs_r["Norm_2"])
        sc_d, sh_d = _affine(bp_d["Norm_2"], bs_d["Norm_2"])
        residual = residual.astype(jnp.float32) * jnp.concatenate(
            [sc_r, sc_d]
        ) + jnp.concatenate([sh_r, sh_d])

    return act(h + residual.astype(jnp.float32)).astype(dtype)


def _blockdiag(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(..., C, C) x2 -> (..., 2C, 2C) block-diagonal stack."""
    z = jnp.zeros_like(a)
    top = jnp.concatenate([a, z], axis=-1)
    bot = jnp.concatenate([z, b], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _pack_chain_stacks(sr: Dict[str, jnp.ndarray],
                       sd: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Two per-stream chain-param stacks -> one 2C block-diagonal stack.

    Valid because neither the vertical nor the horizontal NBt1D taps mix
    channels across streams; per-channel vectors concatenate.
    """
    return {
        "w31": _blockdiag(sr["w31"], sd["w31"]),
        "w13": _blockdiag(sr["w13"], sd["w13"]),
        "b31": jnp.concatenate([sr["b31"], sd["b31"]], axis=-1),
        "b13": jnp.concatenate([sr["b13"], sd["b13"]], axis=-1),
        "bn_scale": jnp.concatenate([sr["bn_scale"], sd["bn_scale"]], axis=-1),
        "bn_shift": jnp.concatenate([sr["bn_shift"], sd["bn_shift"]], axis=-1),
    }


def _packed_stage(x, sp_r, ss_r, sp_d, ss_d, features, stride, n_blocks,
                  fused, dtype, activation):
    """One backbone stage over the packed stream.

    The stride-1 tail (all blocks but a strided block0) runs as a fused
    Pallas chain when eligible — mirroring
    models/layers.py::apply_blocks_maybe_fused: per-stream C=64 tails
    pack into ONE dense block-diagonal C=128 chain; per-stream C=128
    tails run as two chain calls on the channel halves (a dense 256
    chain would double real FLOPs); everything else stays on packed
    grouped convs.
    """
    act = get_activation_fn(activation)
    tail_start = 1 if stride != 1 else 0
    for j in range(tail_start):
        x = _packed_block(
            x, sp_r[f"block{j}"], ss_r[f"block{j}"],
            sp_d[f"block{j}"], ss_d[f"block{j}"],
            features, stride, dtype, act,
        )
    tail = [f"block{j}" for j in range(tail_start, n_blocks)]
    if not tail:
        return x
    n, h, w, c2 = x.shape
    c = c2 // 2
    use_chain = fused and activation == "relu" and c == features
    if use_chain:
        sr = stack_chain_params(
            [sp_r[t] for t in tail], [ss_r[t] for t in tail]
        )
        sd = stack_chain_params(
            [sp_d[t] for t in tail], [ss_d[t] for t in tail]
        )
        if c == 64 and chain_supported(h, w, 128, len(tail)):
            return nbt1d_chain(x, _pack_chain_stacks(sr, sd))
        if chain_supported(h, w, c, len(tail)):
            out_r = nbt1d_chain(x[..., :c], sr)
            out_d = nbt1d_chain(x[..., c:], sd)
            return jnp.concatenate([out_r, out_d], axis=-1)
    for t in tail:
        x = _packed_block(
            x, sp_r[t], ss_r[t], sp_d[t], ss_d[t], features, 1, dtype, act,
        )
    return x


def _packed_fusion(x, fp, c, fuse_into, use_se, dtype, activation):
    """SE-weighted (or plain) additive fusion on the packed stream.

    The two SE gates pack as block-diagonal dense layers over the packed
    pooled vector; the fused-into half becomes gated_main + gated_other
    while the other half continues UNgated down its branch — exactly
    models/encoder.py::SEFusion under the encoder's uni-directional
    routing.
    """
    main_sl = slice(0, c) if fuse_into == "rgb" else slice(c, 2 * c)
    other_sl = slice(c, 2 * c) if fuse_into == "rgb" else slice(0, c)
    if not use_se:
        fused = x[..., main_sl] + x[..., other_sl]
    else:
        pm, po = fp["se_main"], fp["se_other"]
        pooled = jnp.mean(x, axis=(1, 2))  # (N, 2C), packed [rgb|depth]
        # se_main gates the fused-into half; block order follows the
        # packed [rgb|depth] layout, not the main/other roles
        p_first = pm if fuse_into == "rgb" else po
        p_second = po if fuse_into == "rgb" else pm
        k1 = _blockdiag(
            p_first["Dense_0"]["kernel"], p_second["Dense_0"]["kernel"]
        )
        b1 = jnp.concatenate(
            [p_first["Dense_0"]["bias"], p_second["Dense_0"]["bias"]]
        )
        k2 = _blockdiag(
            p_first["Dense_1"]["kernel"], p_second["Dense_1"]["kernel"]
        )
        b2 = jnp.concatenate(
            [p_first["Dense_1"]["bias"], p_second["Dense_1"]["bias"]]
        )
        s = pooled @ k1.astype(dtype) + b1.astype(dtype)
        s = get_activation_fn(activation)(s)
        s = s @ k2.astype(dtype) + b2.astype(dtype)
        gate = jax.nn.sigmoid(s)
        gated = x * gate[:, None, None, :].astype(x.dtype)
        fused = gated[..., main_sl] + gated[..., other_sl]
    if fuse_into == "rgb":
        return jnp.concatenate([fused, x[..., c:]], axis=-1)
    return jnp.concatenate([x[..., :c], fused], axis=-1)


def packed_encoder_forward(enc, inputs: Dict[str, jnp.ndarray]):
    """Packed-stream replacement for FusedEncoder.__call__ at inference.

    Returns the same (feats, skips) structure: per-modality final maps
    and {downscale: {'rgb': t, 'depth': t}} skips, sliced back out of the
    packed tensor at the boundaries the decoders consume.
    """
    cfg = enc.cfg
    dtype = jnp.dtype(cfg.compute_dtype)
    v = enc.variables
    p, s = v["params"], v["batch_stats"]
    spec = enc.specs["rgb"]
    fuse_into = enc._fuse_into
    use_se = cfg.encoder_fusion.startswith("se-")
    skip_downscales = set(cfg.encoder_decoder_skip_downsamplings)
    fused = cfg.fused_inference

    x = _packed_stem(inputs, p, s, dtype, cfg.activation)
    x = _packed_fusion(
        x, p.get("fusion0"), x.shape[-1] // 2, fuse_into, use_se, dtype,
        cfg.activation,
    )

    from emsanet_tpu.models.encoder import _STAGE_DOWNSCALES

    strides = [1, 2, 2, 2 if spec.downsampling == 32 else 1]
    skips: Dict[int, Dict[str, jnp.ndarray]] = {}
    for i in range(4):
        x = _packed_stage(
            x,
            p[f"rgb_stage{i}"], s[f"rgb_stage{i}"],
            p[f"depth_stage{i}"], s[f"depth_stage{i}"],
            spec.stage_features[i], strides[i], spec.stage_blocks[i],
            fused, dtype, cfg.activation,
        )
        c = spec.stage_out_features[i]
        x = _packed_fusion(
            x, p.get(f"fusion{i + 1}"), c, fuse_into, use_se, dtype,
            cfg.activation,
        )
        downscale = _STAGE_DOWNSCALES[i + 1]
        if downscale in skip_downscales:
            skips[downscale] = {"rgb": x[..., :c], "depth": x[..., c:]}

    c = spec.n_channels_out
    feats = {"rgb": x[..., :c], "depth": x[..., c:]}
    return feats, skips
