"""Upsampling modules.

Reference: `nicr_mt_scene_analysis.model.upsampling.Upsampling` /
`get_upsampling_class` (used at emsanet/decoder.py:23, args.py:289-298).

The reference default 'learned-3x3-zeropad' — nearest x2 followed by a
depthwise 3x3 conv whose kernel is initialized to mimic bilinear
interpolation — was chosen there for TensorRT compatibility. It is kept
here because it is *also* the TPU-friendly choice: nearest x2 is a cheap
reshape/broadcast and the depthwise 3x3 is a small VPU op that XLA fuses
with neighboring elementwise work, whereas true bilinear resize lowers to
gather-heavy code.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# nearest-x2 + this 3x3 kernel == (approximately) bilinear x2; weights sum to 1
_BILINEAR_MIMIC_KERNEL = np.array(
    [
        [0.0625, 0.1250, 0.0625],
        [0.1250, 0.2500, 0.1250],
        [0.0625, 0.1250, 0.0625],
    ],
    dtype=np.float32,
)


def nearest_x2(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor x2 upsampling in NHWC via repeat (no gathers)."""
    n, h, w, c = x.shape
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def _bilinear_mimic_init(key, shape, dtype=jnp.float32):
    # flax depthwise conv kernel shape: (kh, kw, in_per_group=1, features)
    kh, kw, inpg, feats = shape
    assert (kh, kw, inpg) == (3, 3, 1)
    kernel = np.broadcast_to(
        _BILINEAR_MIMIC_KERNEL[:, :, None, None], (3, 3, 1, feats)
    )
    return jnp.asarray(kernel, dtype)


class Upsampling(nn.Module):
    """x2 upsampling selectable by method.

    methods: 'learned-3x3-zeropad' (default), 'learned-3x3' (edge padding),
    'bilinear', 'nearest'.

    With `fused=True` (inference), 'learned-3x3-zeropad' runs in exact
    polyphase form (`ops/polyphase_upsample.py`): the depthwise conv is
    decomposed into 4 parity filters at *input* resolution + one
    depth-to-space, skipping the nearest-upsampled intermediate entirely
    (measured ~18 ms of the 69 ms flagship forward in the naive form).
    The param tree is identical to the unfused path — the kernel is read
    from the same 'depthwise' conv — so checkpoints are interchangeable.
    """

    method: str = "learned-3x3-zeropad"
    fused: bool = False
    # with the fused polyphase path active, skip the final depth-to-space
    # and return the (N, H, W, 4C) parity-domain conv output instead
    # (callers that only reduce over channels interleave their results;
    # see postprocessing.postprocess_semantic_polyphase). Falls back to
    # the interleaved (N, 2H, 2W, C) result when the polyphase path does
    # not trigger — callers detect which by the channel count.
    defer_interleave: bool = False
    # defer even the conv: return the (input, depthwise-kernel) tuple so
    # the consumer can run the fused Pallas upsample+decode megakernel
    # (ops/semantic_decode.py). Callers detect by isinstance(out, tuple);
    # falls back like defer_interleave when the polyphase gate is off.
    defer_conv: bool = False
    # TRAIN-mode conv deferral: return the (input, kernel) tuple in train
    # mode so the loss runs the fused upsample+CE kernel with custom VJP
    # (ops/semantic_train_head.py) — the full-res logits never exist
    defer_conv_train: bool = False
    # allow the exact polyphase form in train mode too (differentiable;
    # ModelConfig.train_polyphase_upsampling)
    train_polyphase: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        method = self.method.lower()
        if method == "nearest":
            return nearest_x2(x)
        if method == "bilinear":
            n, h, w, c = x.shape
            return jax.image.resize(
                x, (n, 2 * h, 2 * w, c), method="bilinear"
            ).astype(x.dtype)
        if method in ("learned-3x3-zeropad", "learned-3x3"):
            c = x.shape[-1]
            # polyphase wins where the upsampled intermediate is large
            # (measured on v5e b32: 2.4-6.8x at inputs >= 60x80; naive XLA
            # is already fast at 30x40 and below) — tools/upsample_bench.py
            h, w = x.shape[1], x.shape[2]
            if (
                method == "learned-3x3-zeropad"
                and self.defer_conv_train
                and train
                and not self.is_initializing()
            ):
                # params must exist: the depthwise conv below is built
                # during init (is_initializing path) with the same name
                kernel = self.variables["params"]["depthwise"]["kernel"]
                return x, kernel
            if (
                method == "learned-3x3-zeropad"
                and (
                    (self.fused and not train)
                    or (self.train_polyphase and train)
                )
                and h * w >= 60 * 80
                and not self.is_initializing()
            ):
                from emsanet_tpu.ops.polyphase_upsample import (
                    upsample2x_depthwise_polyphase,
                    upsample2x_depthwise_polyphase_deferred,
                )

                # kernel stays f32: parity-tap sums are built in param
                # dtype and cast to x.dtype only at conv time (matches
                # nn.Conv's promotion to within rounding).
                kernel = self.variables["params"]["depthwise"]["kernel"]
                if self.defer_conv and not train:
                    return x, kernel
                if self.defer_interleave and not train:
                    return upsample2x_depthwise_polyphase_deferred(x, kernel)
                return upsample2x_depthwise_polyphase(x, kernel)
            up = nearest_x2(x)
            if method == "learned-3x3":
                up = jnp.pad(up, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
                padding = "VALID"
            else:
                padding = "SAME"  # zero padding
            return nn.Conv(
                features=c,
                kernel_size=(3, 3),
                padding=padding,
                feature_group_count=c,
                use_bias=False,
                kernel_init=_bilinear_mimic_init,
                dtype=self.dtype,
                name="depthwise",
            )(up)
        raise ValueError(f"Unknown upsampling method '{self.method}'")


def resize_bilinear(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear resize to an arbitrary size (context module branches)."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, height, width, c), method="bilinear").astype(
        x.dtype
    )


def resize_nearest(x: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, height, width, c), method="nearest").astype(
        x.dtype
    )
