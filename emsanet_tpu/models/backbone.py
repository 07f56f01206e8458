"""ResNet backbone family with pluggable residual blocks.

Reference: `nicr_mt_scene_analysis.model.backbone.get_backbone`
(emsanet/model.py:47-58; SURVEY.md M1): ResNet-18/34/50/101 with
pluggable block (basicblock / bottleneck / nonbottleneck1d), SE variants,
reduced-downsampling variants ('-d16'), and a 1-channel depth stem.

Built stage-wise (stem + 4 stages as separate submodules) so the fused
dual-modality encoder can interleave SE fusion between stages.
NHWC layout; channels are multiples of 64 so conv GEMMs tile cleanly onto
the 128x128 MXU at bf16.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from emsanet_tpu.models.layers import (
    BLOCK_CLASSES,
    Bottleneck,
    ConvNormAct,
    Norm,
    SqueezeExcitation,
    get_activation_fn,
    get_block_class,
)

Dtype = Any


@dataclasses.dataclass(frozen=True)
class BackboneSpec:
    """Static description of a ResNet variant."""

    name: str
    stage_blocks: Tuple[int, ...]
    stage_features: Tuple[int, ...] = (64, 128, 256, 512)
    bottleneck: bool = False  # True for resnet50/101 (x4 expansion)
    se: bool = False
    downsampling: int = 32  # final downscale; 16 for '-d16' variants

    @property
    def stage_out_features(self) -> Tuple[int, ...]:
        mult = 4 if self.bottleneck else 1
        return tuple(f * mult for f in self.stage_features)

    @property
    def n_channels_out(self) -> int:
        return self.stage_out_features[-1]

    def skip_features(self, downscales: Sequence[int]) -> Tuple[int, ...]:
        """Feature count of the skip at each requested downscale."""
        by_downscale = {4: 0, 8: 1, 16: 2, 32: 3}
        return tuple(self.stage_out_features[by_downscale[d]] for d in downscales)


_BASE_SPECS = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True),
    "resnet101": ((3, 4, 23, 3), True),
}


def get_backbone_spec(name: str) -> BackboneSpec:
    """Parse backbone names like 'resnet34', 'resnet34se', 'resnet18-d16'."""
    base = name.lower()
    downsampling = 32
    if base.endswith("-d16"):
        base, downsampling = base[:-4], 16
    se = False
    if base.endswith("se"):
        base, se = base[:-2], True
    if base not in _BASE_SPECS:
        raise ValueError(f"Unknown backbone '{name}'")
    stage_blocks, bottleneck = _BASE_SPECS[base]
    return BackboneSpec(
        name=name.lower(),
        stage_blocks=stage_blocks,
        bottleneck=bottleneck,
        se=se,
        downsampling=downsampling,
    )


# trace-time A/B knobs for the space-to-depth stem (tools/stem_ab.py):
# eval-mode rewrite on/off, and the train-mode enable. Train measured a
# win under autodiff too (tools/stem_ab.py --train, one process, b8 fused:
# 72.48 -> 71.47 ms/step — the depth stem; the rgb stem stays strided at
# train batch sizes via the c/n gate below). NOTE: these are read at
# TRACE time — toggling them does not invalidate existing jit caches;
# A/B tools must build a fresh jitted closure per setting.
STEM_SPACE_TO_DEPTH = True
STEM_SPACE_TO_DEPTH_TRAIN = True


class ResNetStem(nn.Module):
    """7x7/2 conv + norm + act + 3x3/2 maxpool -> 1/4 resolution.

    With `space_to_depth` the strided 7x7 runs in its exact
    space-to-depth form: the input is 2x2-pixel-packed to (H/2, W/2, 4C)
    and the conv becomes a stride-1 4x4 conv whose kernel is a pure
    zero-pad + reshape of the SAME (7,7,C,F) parameter — XLA:TPU lowers
    strided convs over 1/3-channel inputs pathologically (measured
    3.3 + 2.7 ms of the 52 ms b32 flagship forward vs a ~0.6 ms
    roofline, tools/fwd_breakdown.py; the packed form measured 4.6x
    faster). Derivation: output row reads input rows 2i+d, d in [-3,3];
    packed row u = i + floor(d/2), parity s = d mod 2, so kernel tap
    a' = d+4 in the (3,3)->(4,4)-padded kernel splits exactly as
    a' = 2*(du+2) + s — a reshape. Param tree and numerics (up to conv
    accumulation order) are unchanged; checkpoints interchangeable.
    """

    features: int = 64
    normalization: str = "batchnorm"
    activation: str = "relu"
    # None = measured auto-gate (depth stem always, rgb stem at n<=2);
    # True = force the packed form (A/B tools); False = always strided
    space_to_depth: Optional[bool] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        n, h, w, c = x.shape
        conv = nn.Conv(
            self.features, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
            use_bias=False, dtype=self.dtype, name="Conv_0",
        )
        # measured auto-gate (tools/stem_ab.py, v5e 480x640 bf16): the
        # 1-channel (depth) stem wins at every batch (b32 standalone
        # 3.18 -> 2.77 ms); the 3-channel stem wins only in the
        # launch-bound latency regime (b1 e2e +8.6%, 5.88 -> 5.37 ms)
        # and LOSES at throughput (b32 standalone 3.78 -> 4.86 ms)
        if self.space_to_depth is None:
            use_s2d = (
                STEM_SPACE_TO_DEPTH
                and (not train or STEM_SPACE_TO_DEPTH_TRAIN)
                and (c == 1 or n <= 2)
            )
        else:
            use_s2d = self.space_to_depth
        if (
            use_s2d
            and h % 2 == 0
            and w % 2 == 0
            and not self.is_initializing()
        ):
            k7 = self.variables["params"]["Conv_0"]["kernel"]  # (7,7,C,F)
            f = k7.shape[-1]
            # tap d+4 in the (1,0)-padded 8x8 kernel = (2*(du+2) + s)
            k8 = jnp.pad(k7, ((1, 0), (1, 0), (0, 0), (0, 0)))
            k4 = k8.reshape(4, 2, 4, 2, c, f)
            k4 = jnp.transpose(k4, (0, 2, 1, 3, 4, 5)).reshape(4, 4, 4 * c, f)
            xp = x.reshape(n, h // 2, 2, w // 2, 2, c)
            xp = jnp.transpose(xp, (0, 1, 3, 2, 4, 5)).reshape(
                n, h // 2, w // 2, 4 * c
            )
            dt = jnp.dtype(self.dtype)
            x = jax.lax.conv_general_dilated(
                xp.astype(dt),
                k4.astype(dt),
                window_strides=(1, 1),
                padding=[(2, 1), (2, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            x = conv(x)
        x = Norm(self.normalization, dtype=self.dtype)(x, train=train)
        x = get_activation_fn(self.activation)(x)
        x = nn.max_pool(
            x, window_shape=(3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)]
        )
        return x


class ResNetStage(nn.Module):
    """A sequence of residual blocks; first block applies the stage stride."""

    block: str
    n_blocks: int
    features: int
    stride: int = 1
    dropout_p: float = 0.0
    se: bool = False
    normalization: str = "batchnorm"
    activation: str = "relu"
    fused_inference: bool = False
    fused_training: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, deterministic: bool = True
    ) -> jnp.ndarray:
        block_cls = get_block_class(self.block)
        blocks = [
            block_cls(
                features=self.features,
                stride=self.stride if i == 0 else 1,
                dropout_p=self.dropout_p,
                normalization=self.normalization,
                activation=self.activation,
                dtype=self.dtype,
                name=f"block{i}",
            )
            for i in range(self.n_blocks)
        ]
        if not self.se:
            from emsanet_tpu.models.layers import apply_blocks_maybe_fused

            strides = [self.stride] + [1] * (self.n_blocks - 1)
            return apply_blocks_maybe_fused(
                self, blocks, strides, x,
                train=train, deterministic=deterministic,
                fused=self.fused_inference,
                fused_train=self.fused_training,
            )
        for i, b in enumerate(blocks):
            x = b(x, train=train, deterministic=deterministic)
            x = SqueezeExcitation(
                activation=self.activation, dtype=self.dtype,
                name=f"se{i}",
            )(x)
        return x


def make_backbone_stages(
    spec: BackboneSpec,
    block: str,
    dropout_p: float,
    normalization: str,
    activation: str,
    dtype: Dtype,
    name_prefix: str,
    remat: bool = False,
    fused_inference: bool = False,
    fused_training: bool = False,
):
    """Build (stem, [stage0..stage3]) submodules for a backbone.

    Stage strides: stage0 keeps 1/4, stages 1-3 halve; with downsampling=16
    the final stage keeps its resolution (reduced-downsampling variant,
    SURVEY.md M1 'resnet18-d16'). With `remat`, each stage is wrapped in
    jax.checkpoint (activations recomputed in the backward pass).
    """
    # bottleneck backbones ignore a custom block choice for stages (the
    # reference's resnet50/101 are bottleneck-only)
    block_name = "bottleneck" if spec.bottleneck else block
    stem = ResNetStem(
        normalization=normalization,
        activation=activation,
        dtype=dtype,
        name=f"{name_prefix}_stem",
    )
    strides = [1, 2, 2, 2 if spec.downsampling == 32 else 1]
    stage_cls = (
        nn.remat(ResNetStage, static_argnums=(2, 3)) if remat else ResNetStage
    )
    stages = [
        stage_cls(
            block=block_name,
            n_blocks=spec.stage_blocks[i],
            features=spec.stage_features[i],
            stride=strides[i],
            dropout_p=dropout_p,
            se=spec.se,
            normalization=normalization,
            activation=activation,
            fused_inference=fused_inference,
            fused_training=fused_training,
            dtype=dtype,
            name=f"{name_prefix}_stage{i}",
        )
        for i in range(4)
    ]
    return stem, stages
