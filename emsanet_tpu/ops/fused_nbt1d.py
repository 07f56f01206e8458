"""Fused NonBottleneck1D inference block as a Pallas TPU kernel.

The roofline analysis (CLAUDE.md) shows the forward pass is HBM-bound at
~14% MXU utilization: every NBt1D block runs 4 factorized convs + 2 norms
+ 5 activations, each a separate HBM round-trip under XLA fusion limits.
This kernel keeps the whole feature map of one image in VMEM (at 1/4
resolution and below the maps are <= ~2.5 MB bf16) and runs the entire
block — 3x1, ReLU, 1x3, BN+ReLU, 3x1, ReLU, 1x3, BN, +residual, ReLU —
as 12 in-register MXU matmuls (one per spatial tap) with zero
intermediate HBM traffic.

Inference-only: BatchNorm is folded to per-channel scale/shift
(fold_batchnorm). The flax block (models/layers.py NonBottleneck1D)
remains the training path and the numerics oracle; `fused_nbt1d_params`
extracts the kernel's inputs from a block's param/batch_stats trees.

STATUS (round 1, measured on v5e): numerics exact (sum rel err ~3e-6 vs
the flax block on-device), but NOT yet faster — XLA's per-block time is
already at the HBM roofline (e.g. 0.143 ms at (32,60,80,128) = the
~78 MB r/w bound), and this v1 (f32 VMEM compute, vmap over batch, no
row tiling) measures ~0.25 ms there and crashes the Mosaic compiler at
(32,120,160,64) and C=512 shapes. Round-2 plan: bf16 MXU compute, batch
via grid with double buffering, row tiling with halos — the win must
come from fusing *across consecutive blocks* (an entire 3-block stage per
VMEM residency), not within one block. Not wired into the model.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x1(x, w, b):
    """3x1 (vertical) conv over (H, W*C) flattened rows.

    x: (H, W, C) f32 in VMEM; w: (3, C, C); b: (C,).
    out[h] = sum_dh x[h+dh-1] @ w[dh] (+ b), zero padding at edges.
    """
    h = x.shape[0]
    up = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])], axis=0)
    down = jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)
    out = (
        jnp.einsum("hwc,co->hwo", down, w[0],
                   preferred_element_type=jnp.float32)
        + jnp.einsum("hwc,co->hwo", x, w[1],
                     preferred_element_type=jnp.float32)
        + jnp.einsum("hwc,co->hwo", up, w[2],
                     preferred_element_type=jnp.float32)
    )
    return out + b[None, None, :]


def _conv1x3(x, w, b):
    """1x3 (horizontal) conv; same structure along W."""
    left = jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
    right = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
    out = (
        jnp.einsum("hwc,co->hwo", left, w[0],
                   preferred_element_type=jnp.float32)
        + jnp.einsum("hwc,co->hwo", x, w[1],
                     preferred_element_type=jnp.float32)
        + jnp.einsum("hwc,co->hwo", right, w[2],
                     preferred_element_type=jnp.float32)
    )
    return out + b[None, None, :]


def _nbt1d_kernel(x_ref, w31a_ref, b31a_ref, w13a_ref, b13a_ref,
                  s1_ref, t1_ref, w31b_ref, b31b_ref, w13b_ref, b13b_ref,
                  s2_ref, t2_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)  # (H, W, C)
    h = jax.nn.relu(_conv3x1(x, w31a_ref[:].astype(jnp.float32),
                             b31a_ref[:].astype(jnp.float32)))
    h = _conv1x3(h, w13a_ref[:].astype(jnp.float32),
                 b13a_ref[:].astype(jnp.float32))
    h = jax.nn.relu(h * s1_ref[:][None, None, :] + t1_ref[:][None, None, :])
    h = jax.nn.relu(_conv3x1(h, w31b_ref[:].astype(jnp.float32),
                             b31b_ref[:].astype(jnp.float32)))
    h = _conv1x3(h, w13b_ref[:].astype(jnp.float32),
                 b13b_ref[:].astype(jnp.float32))
    h = h * s2_ref[:][None, None, :] + t2_ref[:][None, None, :]
    out_ref[:] = jax.nn.relu(h + x).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_nbt1d(
    x: jnp.ndarray,
    params: Dict[str, jnp.ndarray],
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused inference NBt1D block (stride 1, identity residual).

    x: (N, H, W, C); params: dict with w31a/b13a/w31b/w13b (3, C, C),
    b31a/b13a/b31b/b13b (C,), bn1_scale/bn1_shift/bn2_scale/bn2_shift (C,).
    The (H, W, C) map must fit in VMEM (true for EMSANet stages at <= 1/4
    resolution).
    """
    n, h, w, c = x.shape

    def single(x_i):
        return pl.pallas_call(
            _nbt1d_kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 13,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h, w, c), x.dtype),
            interpret=interpret,
        )(
            x_i,
            params["w31a"], params["b31a"], params["w13a"], params["b13a"],
            params["bn1_scale"], params["bn1_shift"],
            params["w31b"], params["b31b"], params["w13b"], params["b13b"],
            params["bn2_scale"], params["bn2_shift"],
        )

    return jax.vmap(single)(x)


def fold_batchnorm(scale, bias, mean, var, eps: float = 1e-5):
    """BN at inference = per-channel affine: y = x*s + t."""
    s = scale / np.sqrt(np.asarray(var) + eps)
    t = bias - mean * s
    return jnp.asarray(s, jnp.float32), jnp.asarray(t, jnp.float32)


def fused_nbt1d_params(block_params, block_stats) -> Dict[str, jnp.ndarray]:
    """Extract fused-kernel inputs from a flax NonBottleneck1D param tree.

    Layout conversion: flax 3x1 conv kernels are (3, 1, C, C) -> (3, C, C);
    1x3 kernels are (1, 3, C, C) -> (3, C, C).
    """
    def conv(name, vertical):
        k = np.asarray(block_params[name]["kernel"])
        k = k[:, 0] if vertical else k[0]
        return jnp.asarray(k, jnp.float32), jnp.asarray(
            block_params[name]["bias"], jnp.float32
        )

    w31a, b31a = conv("Conv_0", True)
    w13a, b13a = conv("Conv_1", False)
    w31b, b31b = conv("Conv_2", True)
    w13b, b13b = conv("Conv_3", False)
    bn1 = block_params["Norm_0"]["BatchNorm_0"]
    st1 = block_stats["Norm_0"]["BatchNorm_0"]
    bn2_name = "Norm_1" if "Norm_1" in block_params else "BatchNorm_0"
    if "Norm_1" in block_params:
        bn2 = block_params["Norm_1"]["BatchNorm_0"]
        st2 = block_stats["Norm_1"]["BatchNorm_0"]
    else:  # zero-init residual variant stores BatchNorm_0 directly
        bn2 = block_params["BatchNorm_0"]
        st2 = block_stats["BatchNorm_0"]
    s1, t1 = fold_batchnorm(np.asarray(bn1["scale"]), np.asarray(bn1["bias"]),
                            np.asarray(st1["mean"]), np.asarray(st1["var"]))
    s2, t2 = fold_batchnorm(np.asarray(bn2["scale"]), np.asarray(bn2["bias"]),
                            np.asarray(st2["mean"]), np.asarray(st2["var"]))
    return {
        "w31a": w31a, "b31a": b31a, "w13a": w13a, "b13a": b13a,
        "w31b": w31b, "b31b": b31b, "w13b": w13b, "b13b": b13b,
        "bn1_scale": s1, "bn1_shift": t1, "bn2_scale": s2, "bn2_shift": t2,
    }
