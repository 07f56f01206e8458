"""CLI adapter: reference-compatible flag names over the dataclass config.

Mirrors the flag surface of `emsanet/args.py` (ArgParserEMSANet) so users
of the reference can switch with the same command lines, including the
`resume <run_dir>` subcommand that replays the recorded argv
(args.py:1076-1103, 1194-1232). Only the TensorRT/ONNX-specific flags are
absent (replaced by the jit inference path, SURVEY.md §2.4).
"""

from __future__ import annotations

import argparse
import json
import os
import socket as _socket
import sys
from typing import List, Optional, Sequence, Tuple

from emsanet_tpu.config import (
    DataConfig,
    EMSANetConfig,
    KNOWN_ACTIVATIONS,
    KNOWN_BACKBONES,
    KNOWN_BLOCKS,
    KNOWN_CLASS_WEIGHTINGS,
    KNOWN_CONTEXT_MODULES,
    KNOWN_DATASETS,
    KNOWN_DECODERS,
    KNOWN_ENCODER_DECODER_FUSIONS,
    KNOWN_ENCODER_FUSIONS,
    KNOWN_LR_SCHEDULERS,
    KNOWN_NORMALIZATIONS,
    KNOWN_OPTIMIZERS,
    KNOWN_TASKS,
    KNOWN_UPSAMPLINGS,
    ModelConfig,
    TrainConfig,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="EMSANet-TPU: efficient multi-task RGB-D scene analysis "
        "on TPU (JAX/XLA/Pallas)",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    g = p.add_argument_group("general")
    g.add_argument("--config", default=None,
                   help="JSON config file (configs/*.json); explicit CLI "
                   "flags override its values")
    g.add_argument("--device", default="tpu", choices=("tpu", "cpu"),
                   help="compute platform (reference --device, args.py:1163; "
                   "'cpu' also enables the virtual multi-device host "
                   "backend for debugging)")
    g.add_argument("--results-basepath", default="./results")
    g.add_argument("--debug", action="store_true")
    g.add_argument("--skip-sanity-check", action="store_true",
                   help="disable the pre-training sanity forward over one "
                   "batch of every loader (reference args.py:1122)")
    g.add_argument("--validation-only", action="store_true")
    g.add_argument("--visualize-validation", action="store_true")
    g.add_argument("--visualization-output-path", default=None,
                   help="where to write visualized predictions (reference "
                   "args.py:961; default: derived from the weights path)")
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--hostname", default=_socket.gethostname(),
                   help="recorded into args.json (reference args.py:1168)")
    g.add_argument("--notes", default="",
                   help="free-form run notes (reference args.py:1174)")
    g.add_argument("--disable-progress-bars", action="store_true",
                   help="reference args.py:1180")

    g = p.add_argument_group("model")
    g.add_argument("--tasks", nargs="+", default=("semantic",),
                   choices=KNOWN_TASKS)
    g.add_argument("--enable-panoptic", action="store_true")
    g.add_argument("--input-modalities", nargs="+", default=("rgb", "depth"),
                   choices=("rgb", "depth", "rgbd"))
    g.add_argument("--input-height", type=int, default=480)
    g.add_argument("--input-width", type=int, default=640)
    g.add_argument("--activation", default="relu", choices=KNOWN_ACTIVATIONS)
    g.add_argument("--dropout-p", type=float, default=0.1)
    g.add_argument("--encoder-normalization", default="batchnorm",
                   choices=KNOWN_NORMALIZATIONS)
    g.add_argument("--encoder-fusion", default="se-add-uni-rgb",
                   choices=KNOWN_ENCODER_FUSIONS)
    g.add_argument("--rgb-encoder-backbone", default="resnet34")
    g.add_argument("--rgb-encoder-backbone-resnet-block",
                   default="nonbottleneck1d", choices=KNOWN_BLOCKS)
    g.add_argument("--depth-encoder-backbone", default="resnet34")
    g.add_argument("--depth-encoder-backbone-resnet-block",
                   default="nonbottleneck1d", choices=KNOWN_BLOCKS)
    g.add_argument("--rgbd-encoder-backbone", default="resnet34")
    g.add_argument("--rgbd-encoder-backbone-resnet-block",
                   default="nonbottleneck1d", choices=KNOWN_BLOCKS)
    g.add_argument("--no-pretrained-backbone", action="store_true")
    g.add_argument("--encoder-backbone-pretrained-weights-filepath",
                   default=None,
                   help="one pretrained-weights path for every encoder "
                   "backbone (reference args.py:133)")
    g.add_argument("--remat", action="store_true",
                   help="rematerialize encoder stages + decoder modules "
                   "in the backward pass (trades ~1.3x FLOPs for "
                   "activation HBM traffic; the b8 train step is "
                   "HBM-roofline-bound at ~119 GB/step without it)")
    g.add_argument("--fused-training", action="store_true",
                   help="TPU-native extension: fused NBt1D conv-pair "
                   "Pallas train kernels with custom VJP on the "
                   "bandwidth-bound chain sites (ops/nbt1d_train.py; "
                   "v5e b8 measured 102.8 -> 87.2 ms/step)")
    g.add_argument("--fused-inference", action="store_true",
                   help="TPU-native extension: Pallas fused inference "
                   "path (VMEM-resident NBt1D chains, polyphase "
                   "upsampling, fused head decode kernels) for the "
                   "validation/eval forward — the same path bench.py "
                   "times (v5e b32 e2e measured +29%% over unfused)")
    g.add_argument("--head-decode-fusion", default=None,
                   choices=("decode", "decode-both", "decode-planes",
                            "interleave", "auto"),
                   help="with --fused-inference: how far the final head "
                   "x2 stages defer into the Pallas decode kernels; "
                   "'auto' picks the measured-best mode for the "
                   "validation batch size (config.best_head_decode_fusion)")
    g.add_argument("--rgb-encoder-backbone-pretrained-weights-filepath")
    g.add_argument("--depth-encoder-backbone-pretrained-weights-filepath")
    g.add_argument("--rgbd-encoder-backbone-pretrained-weights-filepath")
    g.add_argument("--he-init", nargs="+", default=("encoder-fusion",),
                   choices=("encoder-fusion", "encoder-decoder-fusion",
                            "context-module", "decoder"),
                   help="network parts initialized with He init "
                   "(reference args.py:626)")
    g.add_argument("--no-zero-init-decoder-residuals", action="store_true",
                   help="disable zero-init of the last norm in decoder "
                   "residual blocks (reference args.py:640)")
    g.add_argument("--context-module", default="ppm",
                   choices=KNOWN_CONTEXT_MODULES)
    g.add_argument("--upsampling-context-module", default="bilinear",
                   choices=("nearest", "bilinear"))
    g.add_argument("--upsampling-prediction", default="learned-3x3-zeropad",
                   choices=KNOWN_UPSAMPLINGS)
    g.add_argument("--decoder-normalization", default="batchnorm",
                   choices=KNOWN_NORMALIZATIONS)
    g.add_argument("--encoder-decoder-skip-downsamplings", nargs="+",
                   type=int, default=(4, 8, 16))
    g.add_argument("--compute-dtype", default="float32",
                   choices=("float32", "bfloat16"))

    for task in ("semantic", "instance", "normal"):
        g = p.add_argument_group(f"model: {task} decoder")
        g.add_argument(f"--{task}-decoder", default="emsanet",
                       choices=KNOWN_DECODERS)
        g.add_argument(f"--{task}-decoder-block", default="nonbottleneck1d",
                       choices=KNOWN_BLOCKS)
        g.add_argument(f"--{task}-decoder-block-dropout-p", type=float,
                       default=0.2)
        g.add_argument(f"--{task}-decoder-n-blocks", type=int, default=3)
        g.add_argument(f"--{task}-decoder-dropout-p", type=float, default=0.1)
        g.add_argument(f"--{task}-decoder-n-channels", nargs="+", type=int,
                       default=(512, 256, 128))
        g.add_argument(f"--{task}-decoder-downsamplings", nargs="+", type=int,
                       default=(16, 8, 4))
        g.add_argument(f"--{task}-decoder-upsampling",
                       default="learned-3x3-zeropad",
                       choices=KNOWN_UPSAMPLINGS)
        g.add_argument(f"--{task}-encoder-decoder-fusion", default="add-rgb",
                       choices=KNOWN_ENCODER_DECODER_FUSIONS)
        g.add_argument(f"--{task}-no-multiscale-supervision",
                       action="store_true",
                       help=f"disable side-output supervision for the {task} "
                       "decoder (reference args.py:731/:757/:782)")

    g = p.add_argument_group("model: deprecated aliases")
    g.add_argument("--encoder-decoder-fusion", default=None,
                   choices=KNOWN_ENCODER_DECODER_FUSIONS,
                   help="[DEPRECATED] sets the fusion of every decoder "
                   "(reference args.py:1268-1315 shim)")
    g.add_argument("--upsampling-decoder", default=None,
                   choices=KNOWN_UPSAMPLINGS,
                   help="[DEPRECATED] sets the upsampling of every decoder")
    g.add_argument("--normalization", default=None,
                   choices=KNOWN_NORMALIZATIONS,
                   help="[DEPRECATED] sets encoder + decoder normalization "
                   "(reference args.py:1270-1275 shim)")
    g.add_argument("--rgb-encoder-backbone-block", default=None,
                   choices=KNOWN_BLOCKS,
                   help="[DEPRECATED] use --rgb-encoder-backbone-resnet-block "
                   "(reference args.py:1277-1285 shim)")
    g.add_argument("--depth-encoder-backbone-block", default=None,
                   choices=KNOWN_BLOCKS,
                   help="[DEPRECATED] use "
                   "--depth-encoder-backbone-resnet-block")
    g.add_argument("--rgbd-encoder-backbone-block", default=None,
                   choices=KNOWN_BLOCKS,
                   help="[DEPRECATED] use "
                   "--rgbd-encoder-backbone-resnet-block")

    g = p.add_argument_group("model: instance head")
    g.add_argument("--instance-center-sigma", type=int, default=8)
    g.add_argument("--instance-center-heatmap-threshold", type=float,
                   default=0.1)
    g.add_argument("--instance-center-heatmap-nms-kernel-size", type=int,
                   default=17)
    g.add_argument("--instance-center-heatmap-apply-foreground-mask",
                   action="store_true")
    g.add_argument("--instance-center-heatmap-top-k", type=int, default=64)
    g.add_argument("--instance-center-encoding", default="sigmoid",
                   choices=("sigmoid", "none"))
    g.add_argument("--instance-offset-encoding", default="tanh",
                   choices=("tanh", "relative", "deeplab"))
    g.add_argument("--instance-offset-distance-threshold", type=int,
                   default=None)

    g = p.add_argument_group("training")
    g.add_argument("--n-epochs", type=int, default=500)
    g.add_argument("--batch-size", type=int, default=8)
    g.add_argument("--optimizer", default="sgd", choices=KNOWN_OPTIMIZERS)
    g.add_argument("--learning-rate", type=float, default=0.01)
    g.add_argument("--learning-rate-scheduler", default="onecycle",
                   choices=KNOWN_LR_SCHEDULERS)
    g.add_argument("--momentum", type=float, default=0.9)
    g.add_argument("--weight-decay", type=float, default=1e-4)
    g.add_argument("--tasks-weighting", nargs="+", type=float, default=None)
    g.add_argument("--instance-weighting", nargs="+", type=float,
                   default=(2, 1))
    g.add_argument("--instance-center-loss", default="mse",
                   choices=("mse", "bce"))
    g.add_argument("--orientation-kappa", type=float, default=1.0)
    g.add_argument("--normal-loss", default="l1")
    g.add_argument("--semantic-loss-label-smoothing", type=float,
                   default=0.0,
                   help="label smoothing for the semantic CE (reference "
                   "args.py '--semantic-loss-label-smoothing')")
    g.add_argument("--scene-loss-label-smoothing", type=float, default=0.0,
                   help="label smoothing for the scene CE (reference "
                   "args.py '--scene-loss-label-smoothing')")
    g.add_argument("--label-smoothing", type=float, default=None,
                   help="[DEPRECATED] sets both per-task smoothings")
    g.add_argument("--semantic-class-weighting", default="median-frequency",
                   choices=KNOWN_CLASS_WEIGHTINGS,
                   help="reference args.py:708")
    g.add_argument("--semantic-class-weighting-logarithmic-c", type=float,
                   default=1.02, help="reference args.py:716")
    g.add_argument("--class-weighting", default=None,
                   choices=KNOWN_CLASS_WEIGHTINGS,
                   help="[DEPRECATED] use --semantic-class-weighting")
    g.add_argument("--class-weighting-c", type=float, default=None,
                   help="[DEPRECATED] use "
                   "--semantic-class-weighting-logarithmic-c")
    g.add_argument("--overfit-n-batches", type=int, default=-1)
    g.add_argument("--validation-on-train", action="store_true",
                   help="validate on the (overfit-subset) train samples "
                   "through the eval preprocessing path instead of the "
                   "validation split — the overfit convergence proof")
    g.add_argument("--n-devices", type=int, default=None,
                   help="data-parallel devices (default: all local)")
    g.add_argument("--distributed", action="store_true",
                   help="call jax.distributed.initialize() for multi-host "
                   "training (each host feeds its own input shard; the "
                   "gradient all-reduce rides ICI within a slice, DCN "
                   "across slices)")
    g.add_argument("--mixed-precision", action="store_true",
                   help="bf16 compute in the train step")

    g = p.add_argument_group("dataset")
    g.add_argument("--dataset", default="nyuv2")
    g.add_argument("--dataset-path", default=None)
    g.add_argument("--split", default="train",
                   help="training split name (reference args.py:822)")
    g.add_argument("--raw-depth", action="store_true")
    g.add_argument("--use-original-scene-labels", action="store_true",
                   help="use the raw per-dataset scene labels instead of "
                   "the unified indoor-domestic set (reference args.py:834)")
    g.add_argument("--aug-scale-min", type=float, default=1.0)
    g.add_argument("--aug-scale-max", type=float, default=1.4)
    g.add_argument("--no-color-flip-aug", dest="disable_color_flip_aug",
                   action="store_true", default=False,
                   help="drop HSV jitter + random horizontal flip from "
                   "the train pipeline (TPU-repo extension; with "
                   "--aug-scale-min/max 1.0 training views equal eval "
                   "views, for overfit-to-convergence proofs)")
    g.add_argument("--n-workers", type=int, default=8)
    g.add_argument("--worker-mode", default="thread",
                   choices=("thread", "process"),
                   help="loader worker pool kind (TPU-repo extension; "
                   "'process' = forked workers, the torch-DataLoader "
                   "analog for multi-core hosts)")
    def _subset_train(s: str):
        # '0.2' or per-concatenated-dataset '0.2:1.0' (args.py:865-881)
        parts = tuple(float(v) for v in str(s).split(":"))
        return parts[0] if len(parts) == 1 else parts

    g.add_argument("--subset-train", type=_subset_train, default=1.0)
    g.add_argument("--subset-deterministic", action="store_true")
    g.add_argument("--cache-dataset", action="store_true")
    g.add_argument("--scannet-semantic-n-classes", type=int, default=40,
                   choices=(20, 40, 200, 549))
    g.add_argument("--scannet-subsample", type=int, default=50)
    g.add_argument("--validation-scannet-subsample", type=int, default=100,
                   choices=(50, 100, 200, 500),
                   help="ScanNet subsample for validation (reference "
                   "args.py:1030)")
    g.add_argument("--hypersim-subsample", type=int, default=1)
    g.add_argument("--hypersim-use-old-depth-stats", action="store_true",
                   help="use pre-Apr-2022 (v030) Hypersim depth stats "
                   "(reference args.py:930); this build warns when the "
                   "prepared meta.json carries no v030 table")
    g.add_argument("--sunrgbd-depth-do-not-force-mm", action="store_true")
    g.add_argument("--sunrgbd-instances-version", default="panopticndt",
                   choices=("emsanet", "panopticndt", "anyold"))
    g.add_argument("--synthetic-n-samples", type=int, default=16)

    g = p.add_argument_group("validation / checkpointing")
    g.add_argument("--validation-batch-size", type=int, default=None)
    g.add_argument("--validation-split", default="valid")
    g.add_argument("--validation-input-height", type=int, default=None)
    g.add_argument("--validation-input-width", type=int, default=None)
    g.add_argument("--validation-full-resolution", action="store_true")
    g.add_argument("--validation-scannet-benchmark-mode", action="store_true")
    g.add_argument("--validation-skip", type=float, default=0.0)
    g.add_argument("--validation-force-interval", type=int, default=20)
    g.add_argument("--checkpointing-metrics", nargs="+", default=())
    g.add_argument("--checkpointing-best-only", action="store_true")
    g.add_argument("--checkpointing-skip", type=float, default=0.0)
    g.add_argument("--resume-ckpt-interval", type=int, default=20)
    g.add_argument("--resume-ckpt-filepath", default=None)
    g.add_argument("--weights-filepath", default=None)

    g = p.add_argument_group("logging")
    g.add_argument("--wandb-mode", default="disabled",
                   choices=("online", "offline", "disabled"))
    g.add_argument("--wandb-project", default="EMSANet-TPU")
    g.add_argument("--wandb-name", default=None,
                   help="[DEPRECATED] use --wandb-project (reference "
                   "args.py:1155)")
    return p


_MODEL_KEYS = {f.name for f in __import__("dataclasses").fields(ModelConfig)}
_DATA_KEYS = {f.name for f in __import__("dataclasses").fields(DataConfig)}
_TRAIN_KEYS = {f.name for f in __import__("dataclasses").fields(TrainConfig)}

# argparse dest -> config field renames
_RENAMES = {
    "rgb_encoder_backbone_block": "rgb_encoder_backbone_block",
    "no_pretrained_backbone": "no_pretrained_backbone",
}


def args_to_config(args: argparse.Namespace) -> EMSANetConfig:
    # deprecated alias rewriting (reference args.py:1268-1315)
    if getattr(args, "encoder_decoder_fusion", None):
        for task in ("semantic", "instance", "normal"):
            setattr(args, f"{task}_encoder_decoder_fusion",
                    args.encoder_decoder_fusion)
    if getattr(args, "upsampling_decoder", None):
        for task in ("semantic", "instance", "normal"):
            setattr(args, f"{task}_decoder_upsampling",
                    args.upsampling_decoder)
    if getattr(args, "normalization", None):
        args.encoder_normalization = args.normalization
        args.decoder_normalization = args.normalization
    # deprecated `--*-encoder-backbone-block` wins over the primary
    # `--*-encoder-backbone-resnet-block` when given (args.py:1277-1285)
    for mod in ("rgb", "depth", "rgbd"):
        dep = getattr(args, f"{mod}_encoder_backbone_block", None)
        primary = getattr(args, f"{mod}_encoder_backbone_resnet_block")
        # the ModelConfig field is named `*_encoder_backbone_block`
        setattr(args, f"{mod}_encoder_backbone_block",
                dep if dep is not None else primary)
    # per-task label smoothing; deprecated --label-smoothing sets both
    if getattr(args, "label_smoothing", None) is not None:
        args.semantic_loss_label_smoothing = args.label_smoothing
        args.scene_loss_label_smoothing = args.label_smoothing
    # reference class-weighting names; deprecated repo aliases win if given
    args.class_weighting = (
        args.class_weighting
        if getattr(args, "class_weighting", None) is not None
        else args.semantic_class_weighting
    )
    args.class_weighting_c = (
        args.class_weighting_c
        if getattr(args, "class_weighting_c", None) is not None
        else args.semantic_class_weighting_logarithmic_c
    )
    if getattr(args, "wandb_name", None):
        args.wandb_project = args.wandb_name
    if getattr(args, "head_decode_fusion", None) == "auto":
        from emsanet_tpu.config import best_head_decode_fusion

        args.head_decode_fusion = best_head_decode_fusion(
            args.validation_batch_size or args.batch_size,
            with_postprocessing=True,
        )
    args.encoder_decoder_fusion = None
    args.upsampling_decoder = None

    model, data, train = {}, {}, {}
    for key, value in vars(args).items():
        if value is None and key not in (
            "tasks_weighting", "instance_offset_distance_threshold",
            "dataset_path", "validation_batch_size",
            "validation_input_height", "validation_input_width",
            "resume_ckpt_filepath", "weights_filepath", "n_devices",
            "rgb_encoder_backbone_pretrained_weights_filepath",
            "depth_encoder_backbone_pretrained_weights_filepath",
        ):
            continue
        if isinstance(value, list):
            value = tuple(value)
        key = _RENAMES.get(key, key)
        if key in _MODEL_KEYS:
            model[key] = value
        elif key in _DATA_KEYS:
            data[key] = value
        elif key in _TRAIN_KEYS:
            train[key] = value
        # unmapped keys (debug, wandb_*) ride on the namespace
    if args.tasks_weighting is not None:
        train["tasks_weighting"] = tuple(args.tasks_weighting)
    train["instance_weighting"] = tuple(args.instance_weighting)
    cfg = EMSANetConfig(
        model=ModelConfig(**model),
        data=DataConfig(**data),
        train=TrainConfig(**train),
    )
    return cfg.validate()


def parse_args(argv: Optional[Sequence[str]] = None):
    """Parse argv (with `resume <run_dir>` subcommand support).

    Returns (config, namespace, argv_used). The resume subcommand replays
    the run's recorded argv.txt and injects --resume-ckpt-filepath
    (reference args.py:1194-1232).
    """
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "resume":
        run_dir = argv[1]
        with open(os.path.join(run_dir, "argsv.txt")) as fh:
            recorded = fh.read().split()
        ckpt = os.path.join(run_dir, "checkpoints", "ckpt_resume.msgpack")
        argv = recorded + ["--resume-ckpt-filepath", ckpt] + argv[2:]
    parser = build_parser()

    # --config: JSON values become parser defaults; explicit flags override
    if "--config" in argv:
        cfg_path = argv[argv.index("--config") + 1]
        with open(cfg_path) as fh:
            file_cfg = json.load(fh)
        defaults = {}
        for section in ("model", "data", "train"):
            for key, value in file_cfg.get(section, {}).items():
                defaults[key] = tuple(value) if isinstance(value, list) \
                    else value
        known = {a.dest for a in parser._actions}
        parser.set_defaults(
            **{k: v for k, v in defaults.items() if k in known}
        )

    ns = parser.parse_args(argv)
    cfg = args_to_config(ns)
    return cfg, ns, argv
