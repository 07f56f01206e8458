"""Context modules: pyramid pooling (PPM) and adaptive variant (APPM).

Reference: `nicr_mt_scene_analysis.model.context_module.get_context_module`
(emsanet/model.py:109-119, SURVEY.md M4). PSPNet-style pyramid pooling on
the 1/32 encoder output, returning `(fused_features, context_branches)`
where the first branch — global average pooling reduced to
``n_channels_reduction`` — also feeds the scene classification head
(`tests/test_interface_decoders.py:75-78`).

'ppm' pools with bins (1, 5); 'ppm-1-2-4-8' with bins (1, 2, 4, 8).
'appm' computes the same bins adaptively in the reference to survive
resolution changes under TensorRT; under jit every shape is static, so the
adaptive variants share this implementation (pool windows are derived from
the traced input shape).
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from emsanet_tpu.models.layers import ConvNormAct
from emsanet_tpu.models.upsampling import resize_bilinear, resize_nearest

Dtype = Any


def _bins_for(name: str) -> Tuple[int, ...]:
    name = name.lower()
    if name in ("ppm", "appm"):
        return (1, 5)
    if name in ("ppm-1-2-4-8", "appm-1-2-4-8"):
        return (1, 2, 4, 8)
    raise ValueError(f"Unknown context module '{name}'")


def adaptive_avg_pool(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Adaptive average pooling to (out_h, out_w), NHWC.

    Matches torch.nn.AdaptiveAvgPool2d semantics: output cell (i, j)
    averages input rows floor(i*H/oh) .. ceil((i+1)*H/oh). Implemented as a
    pair of small matmuls (pooling matrices) so it rides the MXU instead of
    lowering to strided gathers.
    """
    n, h, w, c = x.shape
    if (out_h, out_w) == (h, w):
        return x
    if out_h == 1 and out_w == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True)

    import numpy as np

    def pool_matrix(size_in: int, size_out: int) -> jnp.ndarray:
        m = np.zeros((size_out, size_in), dtype=np.float32)
        for i in range(size_out):
            start = (i * size_in) // size_out
            end = -(-(i + 1) * size_in // size_out)  # ceil
            m[i, start:end] = 1.0 / (end - start)
        return jnp.asarray(m, dtype=x.dtype)

    mh = pool_matrix(h, out_h)  # (oh, h)
    mw = pool_matrix(w, out_w)  # (ow, w)
    x = jnp.einsum("oh,nhwc->nowc", mh, x)
    x = jnp.einsum("pw,nowc->nopc", mw, x)
    return x


class PyramidPoolingModule(nn.Module):
    """PPM: multi-bin pooled branches + input, fused by a 1x1 conv."""

    name_: str = "ppm"
    n_channels_out: int = 512
    normalization: str = "batchnorm"  # reference forces bn (model.py:115-116)
    activation: str = "relu"
    upsampling: str = "bilinear"  # args.py:253
    dtype: Dtype = jnp.float32

    @property
    def bins(self) -> Tuple[int, ...]:
        return _bins_for(self.name_)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        n, h, w, c = x.shape
        bins = self.bins
        reduction = c // len(bins)  # n_channels_reduction (scene head input)

        branches: List[jnp.ndarray] = [x]
        context_outputs: List[jnp.ndarray] = []
        for bi, bin_size in enumerate(bins):
            pooled = adaptive_avg_pool(x, bin_size, bin_size)
            pooled = ConvNormAct(
                reduction,
                (1, 1),
                normalization=self.normalization,
                activation=self.activation,
                dtype=self.dtype,
                name=f"branch{bi}",
            )(pooled, train=train)
            context_outputs.append(pooled)
            if self.upsampling == "nearest":
                up = resize_nearest(pooled, h, w)
            else:
                up = resize_bilinear(pooled, h, w)
            branches.append(up)

        fused = jnp.concatenate(branches, axis=-1)
        fused = ConvNormAct(
            self.n_channels_out,
            (1, 1),
            normalization=self.normalization,
            activation=self.activation,
            dtype=self.dtype,
            name="fuse",
        )(fused, train=train)
        return fused, tuple(context_outputs)


class NoContextModule(nn.Module):
    """Pass-through ('none'): global pool still provided for the scene head."""

    n_channels_out: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        return x, (pooled,)


def get_context_module(
    name: str,
    n_channels_out: int,
    normalization: str,
    activation: str,
    upsampling: str,
    dtype,
):
    if name == "none":
        return NoContextModule(n_channels_out=n_channels_out, dtype=dtype)
    return PyramidPoolingModule(
        name_=name,
        n_channels_out=n_channels_out,
        normalization="batchnorm",
        activation=activation,
        upsampling=upsampling,
        dtype=dtype,
    )


def context_reduction_channels(name: str, n_channels_in: int) -> int:
    """`context_module.n_channels_reduction` (scene head input width)."""
    if name == "none":
        return n_channels_in
    return n_channels_in // len(_bins_for(name))
