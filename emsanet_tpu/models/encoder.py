"""Fused multi-modality encoder.

Reference: `nicr_mt_scene_analysis.model.encoder.get_encoder` +
`encoder_fusion.get_encoder_fusion_class` (emsanet/model.py:95-106,
SURVEY.md M3). Runs the RGB and depth backbones stage-wise; after the stem
and after every stage, depth features are fused into the RGB branch via
SE attention + add ('se-add-uni-rgb' default, args.py:142-148). Emits:

- per-modality final feature maps (dict), and
- a skip dict {downscale: {'rgb': t, 'depth': t}} at the configured
  skip downscales (default 4, 8, 16).

The fused tensors are what the decoders consume through 'add-rgb'
encoder-decoder fusion.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from emsanet_tpu.config import ModelConfig
from emsanet_tpu.models.backbone import (
    BackboneSpec,
    get_backbone_spec,
    make_backbone_stages,
)
from emsanet_tpu.models.layers import SqueezeExcitation

Dtype = Any

# downscale after stem and after each stage for a downsampling-32 backbone
_STAGE_DOWNSCALES = (4, 4, 8, 16, 32)

# fused stem megakernel (ops/stem.py): both stems' conv+BN+ReLU+maxpool
# as one Pallas call over a shared packed input. Trace-time A/B knob —
# toggling does not invalidate jit caches (tools/stem_ab.py builds fresh
# closures per setting). Measured on v5e (tools/stem_kernel_bench.py,
# 480x640 bf16, rgb+depth): b1 1.02 -> 0.24 ms, b8 3.44 -> 1.69,
# b32 6.96 -> 4.71 vs the best XLA stem paths.
STEM_MEGAKERNEL = True


class SEFusion(nn.Module):
    """SE-weighted additive fusion of two modality feature maps.

    fused = SE_main(main) + SE_other(other); the result continues down the
    main branch ('uni' = unidirectional). Plain 'add' fusion skips the SE
    gates.
    """

    use_se: bool = True
    activation: str = "relu"
    he_init: bool = True  # reference default he_init=('encoder-fusion',)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, main: jnp.ndarray, other: jnp.ndarray) -> jnp.ndarray:
        if self.use_se:
            main = SqueezeExcitation(
                activation=self.activation, he_init=self.he_init,
                dtype=self.dtype, name="se_main",
            )(main)
            other = SqueezeExcitation(
                activation=self.activation, he_init=self.he_init,
                dtype=self.dtype, name="se_other",
            )(other)
        return main + other


class FusedEncoder(nn.Module):
    """Dual (RGB + depth), single-modality, or RGBD encoder.

    Fusion modes (emsanet/args.py:142-148):
      'se-add-uni-rgb'   SE gates on both branches, sum into RGB branch
      'se-add-uni-depth' ... into depth branch
      'add-uni-rgb' / 'add-uni-depth'  plain additive fusion
      'none'             no fusion (single modality or rgbd)
    """

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        self._dtype = dtype
        modalities = cfg.input_modalities

        def build(prefix: str, backbone: str, block: str):
            spec = get_backbone_spec(backbone)
            stem, stages = make_backbone_stages(
                spec,
                block=block,
                dropout_p=cfg.dropout_p,
                normalization=cfg.encoder_normalization,
                activation=cfg.activation,
                dtype=dtype,
                name_prefix=prefix,
                remat=cfg.remat,
                fused_inference=cfg.fused_inference,
                fused_training=cfg.fused_training,
            )
            return spec, stem, stages

        specs: Dict[str, BackboneSpec] = {}
        if "rgbd" in modalities:
            spec, self.rgbd_stem, self.rgbd_stages = build(
                "rgbd", cfg.rgbd_encoder_backbone, cfg.rgbd_encoder_backbone_block
            )
            specs["rgbd"] = spec
        else:
            if "rgb" in modalities:
                spec, self.rgb_stem, self.rgb_stages = build(
                    "rgb", cfg.rgb_encoder_backbone, cfg.rgb_encoder_backbone_block
                )
                specs["rgb"] = spec
            if "depth" in modalities:
                spec, self.depth_stem, self.depth_stages = build(
                    "depth",
                    cfg.depth_encoder_backbone,
                    cfg.depth_encoder_backbone_block,
                )
                specs["depth"] = spec
        self.specs = specs

        fusion = cfg.encoder_fusion
        self._fuse_into: Optional[str] = None
        if fusion != "none" and len(self.specs) == 2:
            use_se = fusion.startswith("se-")
            self._fuse_into = "depth" if fusion.endswith("depth") else "rgb"
            self.fusions = [
                SEFusion(
                    use_se=use_se,
                    activation=cfg.activation,
                    he_init="encoder-fusion" in cfg.he_init,
                    dtype=dtype,
                    name=f"fusion{i}",
                )
                for i in range(5)  # stem + 4 stages
            ]

    @property
    def downsampling(self) -> int:
        return max(s.downsampling for s in self.specs.values())

    @property
    def n_channels_out(self) -> int:
        return next(iter(self.specs.values())).n_channels_out

    @property
    def skips_n_channels(self) -> Tuple[int, ...]:
        spec = next(iter(self.specs.values()))
        return spec.skip_features(self.cfg.encoder_decoder_skip_downsamplings)

    def __call__(
        self,
        inputs: Dict[str, jnp.ndarray],
        train: bool = False,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        skip_downscales = set(cfg.encoder_decoder_skip_downsamplings)
        feats = {}
        if self._use_stem_megakernel(inputs, train):
            from emsanet_tpu.ops import stem as stem_ops

            mods = list(self.specs)
            params = self.variables["params"]
            stats = self.variables["batch_stats"]
            xs, k7s, bns = [], [], []
            for m in mods:
                xs.append(inputs[m].astype(self._dtype))
                k7s.append(params[f"{m}_stem"]["Conv_0"]["kernel"])
                bp = params[f"{m}_stem"]["Norm_0"]["BatchNorm_0"]
                bs = stats[f"{m}_stem"]["Norm_0"]["BatchNorm_0"]
                bns.append((bp["scale"], bp["bias"], bs["mean"], bs["var"]))
            outs = stem_ops.fused_stems(tuple(xs), tuple(k7s), tuple(bns))
            feats = dict(zip(mods, outs))
        else:
            for mod in self.specs:
                stem = getattr(self, f"{mod}_stem")
                feats[mod] = stem(
                    inputs[mod].astype(self._dtype), train=train
                )

        skips: Dict[int, Dict[str, jnp.ndarray]] = {}
        fused_mod = self._fuse_into
        if fused_mod is not None:
            other_mod = "depth" if fused_mod == "rgb" else "rgb"
            feats[fused_mod] = self.fusions[0](feats[fused_mod], feats[other_mod])

        for i in range(4):
            for mod in self.specs:
                stage = getattr(self, f"{mod}_stages")[i]
                # positional args: remat-wrapped stages need static_argnums
                feats[mod] = stage(feats[mod], train, deterministic)
            if fused_mod is not None:
                feats[fused_mod] = self.fusions[i + 1](
                    feats[fused_mod], feats[other_mod]
                )
            downscale = _STAGE_DOWNSCALES[i + 1]
            if downscale in skip_downscales:
                skips[downscale] = dict(feats)

        return feats, skips

    def _use_stem_megakernel(self, inputs, train: bool) -> bool:
        """Gate for the fused stem megakernel (ops/stem.py).

        Inference-only (folded running-stat BN); every registry backbone
        uses the standard 64-feature ResNetStem, so eligibility is just
        the norm/act contract plus the kernel's shape support (all
        modalities share one packed input, so spatial shapes must match
        and 4 * total input channels must fit the 16 packed slots).
        """
        cfg = self.cfg
        if train or not STEM_MEGAKERNEL or not cfg.fused_inference:
            return False
        if self.is_initializing():
            return False
        if (
            cfg.encoder_normalization != "batchnorm"
            or cfg.activation != "relu"
        ):
            return False
        shapes = [inputs[m].shape for m in self.specs]
        if any(s[:3] != shapes[0][:3] for s in shapes):
            return False
        from emsanet_tpu.ops.stem import stem_kernel_supported

        _, h, w = shapes[0][:3]
        c_total = sum(s[3] for s in shapes)
        return stem_kernel_supported(h, w, c_total)

