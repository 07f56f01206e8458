"""Polyphase form of the learned-3x3-zeropad x2 upsampling.

The reference's default prediction/decoder upsampling is nearest x2
followed by a SAME-zero-padded depthwise 3x3 conv
(`nicr_mt_scene_analysis.model.upsampling`, emsanet/args.py:292). The
naive lowering materializes the nearest-upsampled intermediate (4x the
input bytes) and then runs a depthwise conv over it at full resolution —
at the fullres head stages (e.g. (32, 240, 320, 40) -> (32, 480, 640, 40))
this is pure HBM traffic and measured ~18 ms of the 69 ms flagship
forward on a v5e.

Polyphase identity (exact, including zero-pad boundaries): for output
parity (p, q) in {0,1}^2,

  out[2i+p, 2j+q, c] = sum_{a,b} K_pq[a, b, c] * in[i+a-1, j+b-1, c]

with K_pq derived from the 3x3 kernel k by summing the taps that land on
the same input pixel under nearest x2:

  row map, p=0: di=-1 <- {a=0};     di=0 <- {a=1, a=2}
  row map, p=1: di=0  <- {a=0, a=1}; di=+1 <- {a=2}
  (same for columns with q/b.)

Zero 'SAME' padding commutes with the decomposition because the
nearest-upsampled plane of a finite input is exactly the finite-extent
upsample (zero outside), so out-of-range input reads are zero in both
formulations.

All four parities are computed as ONE grouped conv at *input* resolution
(features 4C, feature_group_count C, channel layout c*4 + (p*2+q)) and
interleaved with a single reshape/transpose (depth-to-space). HBM
traffic: read input once, write output once — no intermediate at
upsampled resolution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# _PARITY_MAP[p, di, a] = 1 iff upsampled tap a of output parity p reads
# input offset di-1 (see module docstring).
_PARITY_MAP = np.zeros((2, 3, 3), dtype=np.float32)
_PARITY_MAP[0, 0, 0] = 1.0  # p=0: di=-1 <- a=0
_PARITY_MAP[0, 1, 1] = 1.0  # p=0: di=0  <- a=1
_PARITY_MAP[0, 1, 2] = 1.0  # p=0: di=0  <- a=2
_PARITY_MAP[1, 1, 0] = 1.0  # p=1: di=0  <- a=0
_PARITY_MAP[1, 1, 1] = 1.0  # p=1: di=0  <- a=1
_PARITY_MAP[1, 2, 2] = 1.0  # p=1: di=+1 <- a=2


def polyphase_kernels(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 1, C) depthwise kernel -> (3, 3, 1, 4C) grouped parity kernel.

    Output channel layout: c * 4 + (p * 2 + q) — i.e. per-input-channel
    groups of 4 parities, matching `feature_group_count=C` grouped-conv
    output ordering.
    """
    kh, kw, inpg, c = kernel.shape
    assert (kh, kw, inpg) == (3, 3, 1), kernel.shape
    m = jnp.asarray(_PARITY_MAP, kernel.dtype)
    # K[p, q, di, dj, c] = sum_{a,b} m[p,di,a] m[q,dj,b] k[a,b,c]
    k = kernel[:, :, 0, :]
    kp = jnp.einsum("pia,qjb,abc->pqijc", m, m, k)
    # -> (di, dj, 1, c*4 + p*2+q)
    kp = jnp.transpose(kp, (2, 3, 4, 0, 1))  # (3, 3, C, 2, 2)
    return kp.reshape(3, 3, 1, c * 4)


def upsample2x_depthwise_polyphase(
    x: jnp.ndarray, kernel: jnp.ndarray
) -> jnp.ndarray:
    """Exact nearest-x2 + SAME-zero-pad depthwise-3x3, polyphase form.

    x: (N, H, W, C); kernel: flax depthwise shape (3, 3, 1, C).
    Returns (N, 2H, 2W, C) identical (up to dtype rounding) to
    `Upsampling('learned-3x3-zeropad')`.
    """
    return depth_to_space(
        upsample2x_depthwise_polyphase_deferred(x, kernel)
    )


def upsample2x_depthwise_polyphase_deferred(
    x: jnp.ndarray, kernel: jnp.ndarray
) -> jnp.ndarray:
    """Polyphase x2 upsample WITHOUT the final depth-to-space.

    Returns the grouped-conv output (N, H, W, 4C) in the c-major layout
    c*4 + (p*2+q). Per-pixel consumers that reduce over channels (the
    semantic argmax/score decode) can run directly in this domain and
    interleave their tiny results instead — the full-size depth-to-space
    copies of the C-channel map disappear (round-3 roadmap: ~2 copies of
    the full-res head per x2 stage). `depth_to_space` completes the
    upsample exactly when the interleaved map is needed.
    """
    n, h, w, c = x.shape
    kp = polyphase_kernels(kernel).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        kp,
        window_strides=(1, 1),
        padding="SAME",
        feature_group_count=c,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def depth_to_space(y: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C*4) in c*4+(p*2+q) layout -> (N, 2H, 2W, C)."""
    n, h, w, c4 = y.shape
    c = c4 // 4
    y = y.reshape(n, h, w, c, 2, 2)
    y = jnp.transpose(y, (0, 1, 4, 2, 5, 3))
    return y.reshape(n, 2 * h, 2 * w, c)


def upsample2x_depthwise_shifted(
    x: jnp.ndarray, kernel: jnp.ndarray
) -> jnp.ndarray:
    """Same math as `upsample2x_depthwise_polyphase`, shifted-add form.

    Avoids the grouped-conv lowering entirely: 9 shifted multiply-adds
    into a (N, H, W, 2, 2, C) accumulator, then depth-to-space. XLA fuses
    the taps into one pass over the input. Kept as a measured alternative
    (grouped depthwise convs occasionally lower poorly on TPU).
    """
    n, h, w, c = x.shape
    kp = polyphase_kernels(kernel).astype(x.dtype)  # (3, 3, 1, 4C)
    kp = kp.reshape(3, 3, c, 2, 2)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((n, h, w, c, 2, 2), x.dtype)
    for di in range(3):
        for dj in range(3):
            tap = xp[:, di : di + h, dj : dj + w, :]
            acc = acc + tap[..., None, None] * kp[di, dj]
    y = jnp.transpose(acc, (0, 1, 4, 2, 5, 3))
    return y.reshape(n, 2 * h, 2 * w, c)
