"""EMSANet model assembly.

Reference: `emsanet/model.py:26-233` (EMSANet nn.Module). Differences by
design (TPU-first):

- pure-functional flax module, NHWC, single traced `__call__`,
- raw outputs are a nested dict pytree (postprocessing is a separate jit
  stage in `emsanet_tpu.postprocessing`, replacing the reference's
  in-module `do_postprocessing` flag and its CPU panoptic merge),
- bf16 compute / f32 params via `ModelConfig.compute_dtype`.

Forward: encoder(s) with per-stage SE fusion -> context module (PPM) on
the RGB branch (emsanet/model.py:209-217) -> per-task decoders.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from emsanet_tpu.config import ModelConfig
from emsanet_tpu.datasets.base import DatasetConfig
from emsanet_tpu.models.context import (
    context_reduction_channels,
    get_context_module,
)
from emsanet_tpu.models.decoder import (
    DenseDecoder,
    MLPDecoder,
    SceneClassificationHead,
)
from emsanet_tpu.models.encoder import FusedEncoder


class EMSANet(nn.Module):
    """Multi-task RGB-D scene analysis network (flagship model)."""

    cfg: ModelConfig
    dataset_config: DatasetConfig

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        self._dtype = dtype

        self.encoder = FusedEncoder(cfg, name="encoder")
        self.context_module = get_context_module(
            cfg.context_module,
            n_channels_out=self.encoder.n_channels_out,
            normalization="batchnorm",
            activation=cfg.activation,
            upsampling=cfg.upsampling_context_module,
            dtype=dtype,
        )

        semantic_n_classes = self.dataset_config.n_semantic_classes_without_void
        scene_n_classes = self.dataset_config.n_scene_classes_without_void
        zero_init = not cfg.no_zero_init_decoder_residuals

        if "semantic" in cfg.tasks:
            if cfg.semantic_decoder == "emsanet":
                self.semantic_decoder = DenseDecoder(
                    task="semantic",
                    remat=cfg.remat,
                    fused_inference=cfg.fused_inference,
                    fused_training=cfg.fused_training,
                    fused_train_head=(
                        cfg.fused_training and cfg.fused_train_head
                    ),
                    train_polyphase=cfg.train_polyphase_upsampling,
                    head_decode_fusion=cfg.head_decode_fusion,
                    n_channels=cfg.semantic_decoder_n_channels,
                    downsamplings=cfg.semantic_decoder_downsamplings,
                    block=cfg.semantic_decoder_block,
                    n_blocks=cfg.semantic_decoder_n_blocks,
                    block_dropout_p=cfg.semantic_decoder_block_dropout_p,
                    fusion=cfg.semantic_encoder_decoder_fusion,
                    upsampling=cfg.semantic_decoder_upsampling,
                    prediction_upsampling=cfg.upsampling_prediction,
                    normalization=cfg.decoder_normalization,
                    activation=cfg.activation,
                    zero_init_residual=zero_init,
                    n_classes=semantic_n_classes,
                    dtype=dtype,
                )
            else:
                self.semantic_decoder = MLPDecoder(
                    task="semantic",
                    fused_inference=cfg.fused_inference,
                    prediction_upsampling=cfg.upsampling_prediction,
                    normalization=cfg.decoder_normalization,
                    activation=cfg.activation,
                    dropout_p=cfg.semantic_decoder_dropout_p,
                    n_classes=semantic_n_classes,
                    dtype=dtype,
                )

        if "instance" in cfg.tasks:
            with_orientation = "orientation" in cfg.tasks
            if cfg.instance_decoder == "emsanet":
                self.instance_decoder = DenseDecoder(
                    task="instance",
                    remat=cfg.remat,
                    fused_inference=cfg.fused_inference,
                    fused_training=cfg.fused_training,
                    train_polyphase=cfg.train_polyphase_upsampling,
                    head_decode_fusion=cfg.head_decode_fusion,
                    n_channels=cfg.instance_decoder_n_channels,
                    downsamplings=cfg.instance_decoder_downsamplings,
                    block=cfg.instance_decoder_block,
                    n_blocks=cfg.instance_decoder_n_blocks,
                    block_dropout_p=cfg.instance_decoder_block_dropout_p,
                    fusion=cfg.instance_encoder_decoder_fusion,
                    upsampling=cfg.instance_decoder_upsampling,
                    prediction_upsampling=cfg.upsampling_prediction,
                    normalization=cfg.decoder_normalization,
                    activation=cfg.activation,
                    zero_init_residual=zero_init,
                    with_orientation=with_orientation,
                    sigmoid_for_center=cfg.instance_sigmoid_for_center,
                    tanh_for_offset=cfg.instance_tanh_for_offset,
                    dtype=dtype,
                )
            else:
                self.instance_decoder = MLPDecoder(
                    task="instance",
                    fused_inference=cfg.fused_inference,
                    prediction_upsampling=cfg.upsampling_prediction,
                    normalization=cfg.decoder_normalization,
                    activation=cfg.activation,
                    dropout_p=cfg.instance_decoder_dropout_p,
                    with_orientation=with_orientation,
                    sigmoid_for_center=cfg.instance_sigmoid_for_center,
                    tanh_for_offset=cfg.instance_tanh_for_offset,
                    dtype=dtype,
                )

        if "normal" in cfg.tasks:
            if cfg.normal_decoder == "emsanet":
                self.normal_decoder = DenseDecoder(
                    task="normal",
                    remat=cfg.remat,
                    fused_inference=cfg.fused_inference,
                    fused_training=cfg.fused_training,
                    train_polyphase=cfg.train_polyphase_upsampling,
                    n_channels=cfg.normal_decoder_n_channels,
                    downsamplings=cfg.normal_decoder_downsamplings,
                    block=cfg.normal_decoder_block,
                    n_blocks=cfg.normal_decoder_n_blocks,
                    block_dropout_p=cfg.normal_decoder_block_dropout_p,
                    fusion=cfg.normal_encoder_decoder_fusion,
                    upsampling=cfg.normal_decoder_upsampling,
                    prediction_upsampling=cfg.upsampling_prediction,
                    normalization=cfg.decoder_normalization,
                    activation=cfg.activation,
                    zero_init_residual=zero_init,
                    dtype=dtype,
                )
            else:
                self.normal_decoder = MLPDecoder(
                    task="normal",
                    fused_inference=cfg.fused_inference,
                    prediction_upsampling=cfg.upsampling_prediction,
                    normalization=cfg.decoder_normalization,
                    activation=cfg.activation,
                    dropout_p=cfg.normal_decoder_dropout_p,
                    dtype=dtype,
                )

        if "scene" in cfg.tasks:
            self.scene_decoder = SceneClassificationHead(
                n_classes=scene_n_classes, dtype=dtype
            )

    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        train: bool = False,
        with_side_outputs: Optional[bool] = None,
    ) -> Dict[str, Any]:
        """Forward pass.

        batch: 'rgb' (N,H,W,3) and/or 'depth' (N,H,W,1), normalized floats.
        Returns nested raw-output dict; see SURVEY.md §3.4 for the
        postprocessed key contract produced by `postprocessing.postprocess`.
        """
        cfg = self.cfg
        if with_side_outputs is None:
            with_side_outputs = train

        enc_inputs = {}
        if "rgbd" in cfg.input_modalities:
            enc_inputs["rgbd"] = jnp.concatenate(
                [batch["rgb"], batch["depth"]], axis=-1
            )
        else:
            if "rgb" in cfg.input_modalities:
                enc_inputs["rgb"] = batch["rgb"]
            if "depth" in cfg.input_modalities:
                enc_inputs["depth"] = batch["depth"]

        enc_outputs, skips = self.encoder(
            enc_inputs, train=train, deterministic=not train
        )

        # context module input: RGB branch for dual encoders (model.py:209-217)
        if "rgb" in enc_outputs:
            con_input = enc_outputs["rgb"]
        else:
            con_input = next(iter(enc_outputs.values()))
        con_out, con_context = self.context_module(con_input, train=train)

        # whole-trunk decoder megakernel (latency regime): one Pallas
        # call computes every dense decoder's module stack; each decoder
        # then only runs its task head (ops/decoder_trunk.py)
        trunk_feats: Dict[str, jnp.ndarray] = {}
        if (
            not train
            and not with_side_outputs
            and cfg.fused_inference
            and cfg.decoder_megakernel != "off"
            and not self.is_initializing()
        ):
            trunk_feats = self._trunk_megakernel(con_out, skips)

        outputs: Dict[str, Any] = {}
        # per-task multiscale-supervision toggles (args.py:731,757,782)
        if "semantic" in cfg.tasks:
            outputs["semantic"] = self.semantic_decoder(
                con_out, skips, train=train, deterministic=not train,
                with_side_outputs=(
                    with_side_outputs
                    and not cfg.semantic_no_multiscale_supervision
                ),
                trunk_features=trunk_feats.get("semantic"),
            )
        if "instance" in cfg.tasks:
            outputs["instance"] = self.instance_decoder(
                con_out, skips, train=train, deterministic=not train,
                with_side_outputs=(
                    with_side_outputs
                    and not cfg.instance_no_multiscale_supervision
                ),
                trunk_features=trunk_feats.get("instance"),
            )
        if "normal" in cfg.tasks:
            outputs["normal"] = self.normal_decoder(
                con_out, skips, train=train, deterministic=not train,
                with_side_outputs=(
                    with_side_outputs
                    and not cfg.normal_no_multiscale_supervision
                ),
                trunk_features=trunk_feats.get("normal"),
            )
        if "scene" in cfg.tasks:
            outputs["scene"] = {
                "logits": self.scene_decoder(con_context[0])
            }
        return outputs

    def _trunk_megakernel(
        self,
        con_out: jnp.ndarray,
        skips: Dict[int, Dict[str, jnp.ndarray]],
    ) -> Dict[str, jnp.ndarray]:
        """Compute every eligible dense decoder's trunk in ONE Pallas call.

        Returns {} (fall back to the per-decoder path) unless all dense
        decoders share the flagship trunk topology and the shapes pass
        `ops.decoder_trunk.trunk_supported` — the kernel targets the
        dispatch-bound small-batch regime (VERDICT r3 #2).
        """
        cfg = self.cfg
        from emsanet_tpu.ops.decoder_trunk import (
            decoder_trunk,
            stack_trunk_params,
            trunk_supported,
        )

        tasks = [
            t for t in ("semantic", "instance", "normal")
            if t in cfg.tasks and getattr(cfg, f"{t}_decoder") == "emsanet"
        ]
        if not tasks:
            return {}

        def sig(t):
            return (
                getattr(cfg, f"{t}_decoder_n_channels"),
                getattr(cfg, f"{t}_decoder_downsamplings"),
                getattr(cfg, f"{t}_decoder_block"),
                getattr(cfg, f"{t}_decoder_n_blocks"),
                getattr(cfg, f"{t}_encoder_decoder_fusion"),
                getattr(cfg, f"{t}_decoder_upsampling"),
            )

        s0 = sig(tasks[0])
        if any(sig(t) != s0 for t in tasks[1:]):
            return {}
        n_channels, downsamplings, block, n_blocks, fusion, upsampling = s0
        if (
            block != "nonbottleneck1d"
            or upsampling != "learned-3x3-zeropad"
            or cfg.decoder_normalization != "batchnorm"
            or cfg.activation != "relu"
            or not fusion.startswith("add-")
        ):
            return {}
        modality = fusion.split("-", 1)[1]
        if modality not in ("rgb", "depth"):
            return {}
        skip_list = []
        for ds in downsamplings:
            sd = skips.get(ds)
            if sd is None or modality not in sd:
                return {}
            skip_list.append(sd[modality])
        # the kernel always applies the 1x1 skip projection (flax skips
        # it when channels already match)
        if any(
            s.shape[-1] == c for s, c in zip(skip_list, n_channels)
        ):
            return {}
        n, h0, w0, c0 = con_out.shape
        on_tpu = jax.default_backend() == "tpu"
        if cfg.decoder_megakernel == "auto" and not on_tpu:
            return {}  # interpret mode is for tests; force with 'on'
        if not trunk_supported(
            n, h0, w0, n_channels, c0,
            [s.shape[-1] for s in skip_list], n_blocks,
            max_batch=(n if cfg.decoder_megakernel == "on" else None),
            allow_unaligned=not on_tpu,
        ):
            return {}
        v = self.variables
        try:
            dparams = [v["params"][f"{t}_decoder"] for t in tasks]
            dstats = [v["batch_stats"][f"{t}_decoder"] for t in tasks]
        except KeyError:
            return {}
        per_module = stack_trunk_params(
            dparams, dstats, len(n_channels), n_blocks
        )
        out = decoder_trunk(con_out, skip_list, per_module)
        return {t: out[i] for i, t in enumerate(tasks)}


def create_model(
    cfg: ModelConfig, dataset_config: DatasetConfig
) -> EMSANet:
    return EMSANet(cfg=cfg, dataset_config=dataset_config)


def init_model(
    model: EMSANet,
    rng: jax.Array,
    batch_size: int = 1,
    train: bool = False,
):
    """Initialize parameters with a dummy batch of the configured size."""
    cfg = model.cfg
    batch = {}
    if "rgb" in cfg.input_modalities or "rgbd" in cfg.input_modalities:
        batch["rgb"] = jnp.zeros(
            (batch_size, cfg.input_height, cfg.input_width, 3), jnp.float32
        )
    if "depth" in cfg.input_modalities or "rgbd" in cfg.input_modalities:
        batch["depth"] = jnp.zeros(
            (batch_size, cfg.input_height, cfg.input_width, 1), jnp.float32
        )
    params_rng, dropout_rng = jax.random.split(rng)
    variables = model.init(
        {"params": params_rng, "dropout": dropout_rng},
        batch,
        train=train,
    )
    return variables
