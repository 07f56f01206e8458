"""Task decoders: EMSANet dense decoder, SegFormer-style MLP decoder, heads.

Reference: `nicr_mt_scene_analysis.model.decoder.{Semantic,Instance,Normal,
SceneClassification}Decoder` + MLP variants (emsanet/decoder.py:12-19,
SURVEY.md M5).

EMSANet dense decoder = 3 decoder modules with channels (512, 256, 128)
targeting downscales (16, 8, 4). Each module: 3x3 conv (channel reduce) ->
N NonBottleneck1D blocks -> side-output 1x1 head (multi-scale supervision,
taken *before* the upsample, i.e. at downscales 32/16/8 — the reference's
`_down_{8,16,32}` batch keys) -> x2 upsample -> additive encoder-skip
fusion ('add-rgb': 1x1-conv projection of the fused RGB skip + add).

Instance head (weights surgery in emsanet/weights.py:29-56 fixes the
structure): shared 3x3 conv to 32 channels per sub-task (96 = center +
offset + orientation), per-sub-task 3x3 convs -> (1, 2, 2) channels,
concatenated and upsampled x4 by two shared depthwise learned-3x3 stages;
sigmoid on center / tanh on offset applied last (encodings
emsanet/model.py:122-137).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from emsanet_tpu.models.layers import ConvNormAct, Norm, get_activation_fn, get_block_class
from emsanet_tpu.models.upsampling import Upsampling, resize_bilinear

Dtype = Any

# trace-time A/B knob (tools/taskconv_ab.py): run the instance head's
# three tiny task convs as one block-diagonal conv at inference
_FUSED_TASK_CONV = True


class EncoderDecoderFusion(nn.Module):
    """'add-rgb'/'add-depth' skip fusion: 1x1-conv projection + add."""

    mode: str = "add-rgb"
    normalization: str = "batchnorm"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        decoder_feat: jnp.ndarray,
        skips: Dict[str, jnp.ndarray],
        train: bool = False,
    ) -> jnp.ndarray:
        if self.mode == "none":
            return decoder_feat
        modality = self.mode.split("-", 1)[1]  # 'rgb' | 'depth' | 'rgbd'
        if modality == "rgbd":
            skip = skips.get("rgbd")
            if skip is None:  # dual encoder: sum both modalities
                skip = skips["rgb"] + skips["depth"]
        else:
            skip = skips.get(modality)
            if skip is None:  # single-modality fallback
                skip = next(iter(skips.values()))
        if skip.shape[-1] != decoder_feat.shape[-1]:
            skip = nn.Conv(
                decoder_feat.shape[-1], (1, 1), use_bias=False,
                dtype=self.dtype, name="proj",
            )(skip)
            skip = Norm(self.normalization, dtype=self.dtype)(skip, train=train)
        return decoder_feat + skip


class DecoderModule(nn.Module):
    """One EMSANet decoder stage (channel reduce + blocks + up + skip add)."""

    features: int
    block: str = "nonbottleneck1d"
    n_blocks: int = 3
    block_dropout_p: float = 0.2
    side_output_channels: Optional[int] = None
    fusion: str = "add-rgb"
    upsampling: str = "learned-3x3-zeropad"
    normalization: str = "batchnorm"
    activation: str = "relu"
    zero_init_residual: bool = True
    fused_inference: bool = False
    fused_training: bool = False
    train_polyphase: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skips: Optional[Dict[str, jnp.ndarray]],
        train: bool = False,
        deterministic: bool = True,
        with_side_output: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        from emsanet_tpu.models.layers import apply_blocks_maybe_fused

        x = ConvNormAct(
            self.features, (3, 3),
            normalization=self.normalization, activation=self.activation,
            dtype=self.dtype, name="conv_in",
        )(x, train=train)
        block_cls = get_block_class(self.block)
        blocks = [
            block_cls(
                features=self.features,
                dropout_p=self.block_dropout_p,
                normalization=self.normalization,
                activation=self.activation,
                zero_init_residual=self.zero_init_residual,
                dtype=self.dtype,
                name=f"block{i}",
            )
            for i in range(self.n_blocks)
        ]
        x = apply_blocks_maybe_fused(
            self, blocks, [1] * self.n_blocks, x,
            train=train, deterministic=deterministic,
            fused=self.fused_inference,
            fused_train=self.fused_training,
        )

        side = None
        if with_side_output and self.side_output_channels:
            side = nn.Conv(
                self.side_output_channels, (1, 1), use_bias=True,
                dtype=self.dtype, name="side_output",
            )(x)

        x = Upsampling(self.upsampling, fused=self.fused_inference,
                       train_polyphase=self.train_polyphase,
                       dtype=self.dtype, name="upsample")(x, train=train)
        if skips is not None:
            x = EncoderDecoderFusion(
                mode=self.fusion, normalization=self.normalization,
                dtype=self.dtype, name="skip_fusion",
            )(x, skips, train=train)
        return x, side


class PredictionUpsampling(nn.Module):
    """x4 upsampling of head predictions to network input resolution.

    Two stacked x2 stages of the configured prediction upsampling
    (args.py:292 'learned-3x3-zeropad' default). For learned-3x3 this is a
    pair of shared depthwise convs over the prediction channels (the
    'head.upsampling' keys patched in emsanet/weights.py:54-56).
    """

    method: str = "learned-3x3-zeropad"
    fused: bool = False
    # leave the final x2 stage in the polyphase (pre-interleave) domain
    # when the fused path triggers; caller detects by channel count
    defer_final: bool = False
    # defer the final x2 stage's conv too: return (half-res input,
    # depthwise kernel) for the fused Pallas upsample+decode megakernel
    # (ops/semantic_decode.py); caller detects by isinstance tuple
    defer_final_conv: bool = False
    # TRAIN-mode final-conv deferral for the fused upsample+CE loss
    # kernel (ops/semantic_train_head.py)
    defer_final_conv_train: bool = False
    train_polyphase: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = Upsampling(self.method, fused=self.fused,
                       train_polyphase=self.train_polyphase,
                       dtype=self.dtype, name="up0")(x, train=train)
        x = Upsampling(self.method, fused=self.fused,
                       train_polyphase=self.train_polyphase,
                       defer_interleave=self.defer_final,
                       defer_conv=self.defer_final_conv,
                       defer_conv_train=self.defer_final_conv_train,
                       dtype=self.dtype,
                       name="up1")(x, train=train)
        return x


class DenseDecoder(nn.Module):
    """EMSANet conv decoder shared by semantic / instance / normal tasks.

    `head_channels` drives the task head:
      semantic: single conv -> n_classes logits
      instance: shared conv + per-sub-task convs (see module docstring)
      normal: conv -> 3, L2-normalized
    """

    task: str  # 'semantic' | 'instance' | 'normal'
    n_channels: Tuple[int, ...] = (512, 256, 128)
    downsamplings: Tuple[int, ...] = (16, 8, 4)
    block: str = "nonbottleneck1d"
    n_blocks: int = 3
    block_dropout_p: float = 0.2
    fusion: str = "add-rgb"
    upsampling: str = "learned-3x3-zeropad"
    prediction_upsampling: str = "learned-3x3-zeropad"
    normalization: str = "batchnorm"
    activation: str = "relu"
    zero_init_residual: bool = True
    # semantic
    n_classes: int = 40
    # instance
    with_orientation: bool = False
    sigmoid_for_center: bool = True
    tanh_for_offset: bool = True
    n_channels_per_task: int = 32
    remat: bool = False
    fused_inference: bool = False
    fused_training: bool = False
    train_polyphase: bool = False
    # TRAIN mode: defer the semantic head's final x2 conv into the fused
    # upsample+CE loss kernel (ops/semantic_train_head.py)
    fused_train_head: bool = False
    # 'decode' | 'interleave': how far the final semantic x2 stage
    # defers under fused_inference (ModelConfig.head_decode_fusion)
    head_decode_fusion: str = "decode"
    dtype: Dtype = jnp.float32

    def _head_out_channels(self) -> int:
        if self.task == "semantic":
            return self.n_classes
        if self.task == "instance":
            return 5 if self.with_orientation else 3  # 1 center + 2 offset (+2)
        if self.task == "normal":
            return 3
        raise ValueError(f"Unknown dense decoder task '{self.task}'")

    @nn.compact
    def __call__(
        self,
        context_out: jnp.ndarray,
        skips: Dict[int, Dict[str, jnp.ndarray]],
        train: bool = False,
        deterministic: bool = True,
        with_side_outputs: bool = False,
        trunk_features: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        """Forward. `trunk_features` (inference-only) injects the decoder
        trunk output computed externally by the whole-trunk megakernel
        (`ops/decoder_trunk.py`, wired in models/emsanet.py); the module
        stack is skipped and only the task head runs. Never set during
        init so the full param tree is always created."""
        x = context_out
        side_outputs: List[jnp.ndarray] = []
        module_cls = (
            nn.remat(DecoderModule, static_argnums=(3, 4, 5))
            if self.remat else DecoderModule
        )
        if trunk_features is not None and not self.is_initializing():
            x = trunk_features
        else:
            for i, (feats, downscale) in enumerate(
                zip(self.n_channels, self.downsamplings)
            ):
                x, side = module_cls(
                    features=feats,
                    block=self.block,
                    n_blocks=self.n_blocks,
                    block_dropout_p=self.block_dropout_p,
                    side_output_channels=self._head_out_channels(),
                    fusion=self.fusion,
                    upsampling=self.upsampling,
                    normalization=self.normalization,
                    activation=self.activation,
                    zero_init_residual=self.zero_init_residual,
                    fused_inference=self.fused_inference,
                    fused_training=self.fused_training,
                    train_polyphase=self.train_polyphase,
                    dtype=self.dtype,
                    name=f"module{i}",
                )(
                    # positional: remat-wrapped modules need static_argnums
                    x,
                    skips.get(downscale),
                    train,
                    deterministic,
                    with_side_outputs,
                )
                if side is not None:
                    side_outputs.append(self._encode(side))

        # task head at 1/4, then x4 to full resolution
        if self.task == "instance":
            n_subtasks = 3 if self.with_orientation else 2
            h = ConvNormAct(
                self.n_channels_per_task * n_subtasks, (3, 3),
                normalization=self.normalization, activation=self.activation,
                dtype=self.dtype, name="head_shared_conv",
            )(x, train=train)
            out_channels = (1, 2, 2)[:n_subtasks]
            if (
                self.fused_inference
                and _FUSED_TASK_CONV  # trace-time A/B knob
                and not train
                and not self.is_initializing()
            ):
                # run the three tiny task convs (1/2/2 output channels:
                # terrible MXU lane utilization as separate XLA convs +
                # three input slices) as ONE conv whose kernel is the
                # block-diagonal assembly of the SAME parameters at
                # trace time — exact up to accumulation order (the
                # off-block weights are exact zeros), locked by
                # tests/test_nbt1d_chain.py::
                # test_fused_model_forward_matches_unfused
                v = self.variables["params"]
                cpt = self.n_channels_per_task
                total = sum(out_channels)
                wc = jnp.zeros(
                    (3, 3, cpt * n_subtasks, total), jnp.float32)
                biases = []
                off = 0
                for t in range(n_subtasks):
                    k = v[f"head_task_conv{t}"]["kernel"]
                    biases.append(v[f"head_task_conv{t}"]["bias"])
                    wc = wc.at[
                        :, :, t * cpt:(t + 1) * cpt,
                        off:off + out_channels[t],
                    ].set(k.astype(jnp.float32))
                    off += out_channels[t]
                dt = jnp.dtype(self.dtype)
                pred = jax.lax.conv_general_dilated(
                    h.astype(dt), wc.astype(dt),
                    window_strides=(1, 1),
                    padding=[(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + jnp.concatenate(biases).astype(dt)
            else:
                outs = []
                for t in range(n_subtasks):
                    sl = h[
                        ...,
                        t * self.n_channels_per_task
                        : (t + 1) * self.n_channels_per_task,
                    ]
                    outs.append(
                        nn.Conv(
                            out_channels[t], (3, 3), use_bias=True,
                            dtype=self.dtype, name=f"head_task_conv{t}",
                        )(sl)
                    )
                pred = jnp.concatenate(outs, axis=-1)
        else:
            pred = nn.Conv(
                self._head_out_channels(), (3, 3), use_bias=True,
                dtype=self.dtype, name="head_conv",
            )(x)

        n_head = pred.shape[-1]
        pred = PredictionUpsampling(
            self.prediction_upsampling, fused=self.fused_inference,
            train_polyphase=self.train_polyphase,
            # only the semantic head's consumers (argmax/score) commute
            # with the interleave; instance postprocessing (spatial NMS,
            # offset grouping) needs real full-res maps
            defer_final=(self.task == "semantic" and self.fused_inference),
            defer_final_conv=(
                self.fused_inference
                and (
                    (self.task == "semantic"
                     and self.head_decode_fusion.startswith("decode"))
                    or (self.task == "instance"
                        and self.head_decode_fusion
                        in ("decode-planes", "decode-both"))
                )
            ),
            defer_final_conv_train=(
                self.task == "semantic" and self.fused_train_head
            ),
            dtype=self.dtype, name="head_upsampling"
        )(pred, train=train)
        if isinstance(pred, tuple):
            # fully deferred final stage: postprocessing runs the fused
            # Pallas upsample(+decode/encode) kernel — semantic:
            # ops/semantic_decode.py, instance: ops/instance_head.py
            # (which also applies the sigmoid/tanh output encodings)
            x_half, up_kernel = pred
            return {
                "side_outputs": tuple(side_outputs),
                "decode_input": {"x": x_half, "kernel": up_kernel},
            }
        deferred = pred.shape[-1] == 4 * n_head
        if not deferred:
            pred = self._encode(pred)

        out: Dict[str, Any] = {"side_outputs": tuple(side_outputs)}
        if self.task == "semantic":
            if deferred:
                out["logits_polyphase"] = pred
            else:
                out["logits"] = pred
        elif self.task == "normal":
            out["normal"] = pred  # L2-normalized by _encode
        else:
            out["center"] = pred[..., 0:1]
            out["offset"] = pred[..., 1:3]
            if self.with_orientation:
                out["orientation"] = pred[..., 3:5]
        return out

    def _encode(self, pred: jnp.ndarray) -> jnp.ndarray:
        """Apply output encodings (sigmoid center / tanh offset / L2 norm).

        Shared by the full-res head and the side outputs so multiscale
        supervision sees the same encoding as the final prediction.
        """
        if self.task == "normal":
            norm = jnp.linalg.norm(pred, axis=-1, keepdims=True)
            return pred / jnp.maximum(norm, 1e-7)
        if self.task != "instance":
            return pred
        center = pred[..., 0:1]
        offset = pred[..., 1:3]
        if self.sigmoid_for_center:
            center = jax.nn.sigmoid(center)
        if self.tanh_for_offset:
            offset = jnp.tanh(offset)
        parts = [center, offset]
        if self.with_orientation:
            parts.append(pred[..., 3:5])
        return jnp.concatenate(parts, axis=-1)


class MLPDecoder(nn.Module):
    """SegFormer-style all-MLP decoder ('segformermlp', emsanet/decoder.py:80).

    Every scale (skips at 4/8/16 + context output at 32) is linearly
    embedded, upsampled to 1/4, concatenated, fused by a 1x1 conv, and fed
    to the same task heads as the dense decoder. No side outputs
    (multiscale supervision is forced off for MLP decoders,
    args.py:1382-1398).
    """

    task: str
    embed_dim: int = 256
    fusion_modality: str = "rgb"
    prediction_upsampling: str = "learned-3x3-zeropad"
    normalization: str = "batchnorm"
    activation: str = "relu"
    dropout_p: float = 0.1
    n_classes: int = 40
    with_orientation: bool = False
    sigmoid_for_center: bool = True
    tanh_for_offset: bool = True
    n_channels_per_task: int = 32
    fused_inference: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        context_out: jnp.ndarray,
        skips: Dict[int, Dict[str, jnp.ndarray]],
        train: bool = False,
        deterministic: bool = True,
        with_side_outputs: bool = False,
        trunk_features: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        del trunk_features  # dense-decoder megakernel only (decoder.py)
        levels: List[jnp.ndarray] = []
        target_hw: Optional[Tuple[int, int]] = None
        items = sorted(skips.items()) + [(None, {"_ctx": context_out})]
        for i, (downscale, feat_dict) in enumerate(items):
            feat = feat_dict.get(self.fusion_modality)
            if feat is None:
                feat = next(iter(feat_dict.values()))
            emb = nn.Conv(
                self.embed_dim, (1, 1), use_bias=True, dtype=self.dtype,
                name=f"embed{i}",
            )(feat)
            if target_hw is None:
                target_hw = emb.shape[1:3]
            elif emb.shape[1:3] != target_hw:
                emb = resize_bilinear(emb, *target_hw)
            levels.append(emb)

        x = jnp.concatenate(levels, axis=-1)
        x = ConvNormAct(
            self.embed_dim, (1, 1),
            normalization=self.normalization, activation=self.activation,
            dtype=self.dtype, name="fuse",
        )(x, train=train)
        if self.dropout_p > 0:
            x = nn.Dropout(rate=self.dropout_p)(x, deterministic=deterministic)

        if self.task == "instance":
            n_subtasks = 3 if self.with_orientation else 2
            outs = []
            out_channels = (1, 2, 2)[:n_subtasks]
            h = ConvNormAct(
                self.n_channels_per_task * n_subtasks, (3, 3),
                normalization=self.normalization, activation=self.activation,
                dtype=self.dtype, name="head_shared_conv",
            )(x, train=train)
            for t in range(n_subtasks):
                sl = h[
                    ...,
                    t * self.n_channels_per_task : (t + 1) * self.n_channels_per_task,
                ]
                outs.append(
                    nn.Conv(
                        out_channels[t], (3, 3), use_bias=True,
                        dtype=self.dtype, name=f"head_task_conv{t}",
                    )(sl)
                )
            pred = jnp.concatenate(outs, axis=-1)
        elif self.task == "semantic":
            pred = nn.Conv(
                self.n_classes, (1, 1), use_bias=True, dtype=self.dtype,
                name="head_conv",
            )(x)
        else:
            pred = nn.Conv(
                3, (1, 1), use_bias=True, dtype=self.dtype, name="head_conv"
            )(x)

        pred = PredictionUpsampling(
            self.prediction_upsampling, fused=self.fused_inference,
            dtype=self.dtype, name="head_upsampling"
        )(pred, train=train)

        out: Dict[str, Any] = {"side_outputs": ()}
        if self.task == "semantic":
            out["logits"] = pred
        elif self.task == "normal":
            norm = jnp.linalg.norm(pred, axis=-1, keepdims=True)
            out["normal"] = pred / jnp.maximum(norm, 1e-7)
        else:
            center = pred[..., 0:1]
            offset = pred[..., 1:3]
            if self.sigmoid_for_center:
                center = jax.nn.sigmoid(center)
            if self.tanh_for_offset:
                offset = jnp.tanh(offset)
            out["center"] = center
            out["offset"] = offset
            if self.with_orientation:
                out["orientation"] = pred[..., 3:5]
        return out


class SceneClassificationHead(nn.Module):
    """Scene classifier off the global context branch (SURVEY.md M4/M5).

    Input: the first context branch (global average pool reduced to
    n_channels_reduction); output: scene class logits.
    """

    n_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, context_branch: jnp.ndarray) -> jnp.ndarray:
        x = context_branch.reshape(context_branch.shape[0], -1)
        return nn.Dense(self.n_classes, dtype=self.dtype, name="head")(x)
