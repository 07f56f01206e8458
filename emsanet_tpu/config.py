"""Configuration system for EMSANet-TPU.

Replaces the reference's ~150-flag argparse CLI (``emsanet/args.py``) with
typed dataclasses plus the same post-parse normalization/validation rules:

- panoptic requires both semantic and instance tasks (args.py:1329-1336),
- orientation requires instance (args.py:1324-1327),
- learning rate is scaled proportionally to batch size / 8 (args.py:1338-1344),
- default task weighting depends on the enabled task set (args.py:1346-1348),
- raw depth is forced for cityscapes/hypersim/scannet (args.py:1374-1380),
- multiscale supervision is disabled for MLP decoders (args.py:1382-1398),
- single-modality input forces encoder fusion 'none' (args.py:1317-1321).

A CLI adapter (`emsanet_tpu.utils.cli`) exposes the reference flag names on
top of these dataclasses so entry points mirror ``main.py`` usage.

All defaults below mirror the reference defaults (cited per-field).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple, Union

KNOWN_TASKS = ("semantic", "instance", "orientation", "scene", "normal")
KNOWN_BACKBONES = (
    "resnet18",
    "resnet34",
    "resnet50",
    "resnet101",
    "resnet18se",
    "resnet34se",
)
KNOWN_BLOCKS = ("basicblock", "bottleneck", "nonbottleneck1d")
KNOWN_CONTEXT_MODULES = ("ppm", "appm", "ppm-1-2-4-8", "appm-1-2-4-8", "none")
KNOWN_ENCODER_FUSIONS = (
    "se-add-uni-rgb",
    "se-add-uni-depth",
    "add-uni-rgb",
    "add-uni-depth",
    "none",
)
KNOWN_ENCODER_DECODER_FUSIONS = ("add-rgb", "add-depth", "add-rgbd", "none")
KNOWN_UPSAMPLINGS = ("learned-3x3-zeropad", "learned-3x3", "bilinear", "nearest")
KNOWN_DECODERS = ("emsanet", "segformermlp")
KNOWN_ACTIVATIONS = ("relu", "swish", "silu")
KNOWN_NORMALIZATIONS = ("batchnorm", "layernorm", "groupnorm")
KNOWN_OPTIMIZERS = ("sgd", "adam", "adamw", "radam")
KNOWN_LR_SCHEDULERS = ("onecycle",)
KNOWN_CLASS_WEIGHTINGS = ("median-frequency", "logarithmic", "linear", "none")
KNOWN_INSTANCE_CENTER_LOSSES = ("mse", "bce")
KNOWN_DATASETS = (
    "nyuv2",
    "sunrgbd",
    "hypersim",
    "scannet",
    "cityscapes",
    "coco",
    "scenenetrgbd",
    "synthetic",  # in-memory dataset for tests/benchmarks (no reference analog)
)


@dataclass
class ModelConfig:
    """Model topology. Defaults = EMSANet-R34-NBt1D (reference args.py)."""

    # tasks / modalities (args.py:64, :94)
    tasks: Tuple[str, ...] = ("semantic",)
    input_modalities: Tuple[str, ...] = ("rgb", "depth")
    enable_panoptic: bool = False

    # input resolution (args.py:80, :86)
    input_height: int = 480
    input_width: int = 640

    # global knobs (args.py:111, :121, :128, :334 dropout)
    activation: str = "relu"
    dropout_p: float = 0.1

    # encoders (args.py:155, :162, :188, :195, :221, :228)
    rgb_encoder_backbone: str = "resnet34"
    rgb_encoder_backbone_block: str = "nonbottleneck1d"
    depth_encoder_backbone: str = "resnet34"
    depth_encoder_backbone_block: str = "nonbottleneck1d"
    rgbd_encoder_backbone: str = "resnet34"
    rgbd_encoder_backbone_block: str = "nonbottleneck1d"
    encoder_normalization: str = "batchnorm"
    encoder_fusion: str = "se-add-uni-rgb"  # args.py:145
    encoder_decoder_skip_downsamplings: Tuple[int, ...] = (4, 8, 16)  # args.py:264

    # context module (args.py:247, :253)
    context_module: str = "ppm"
    upsampling_context_module: str = "bilinear"

    # decoders — shared (args.py:292, :302, :313)
    upsampling_prediction: str = "learned-3x3-zeropad"
    decoder_normalization: str = "batchnorm"
    encoder_decoder_fusion: str = "add-rgb"

    # semantic decoder (args.py:320-375)
    semantic_decoder: str = "emsanet"
    semantic_decoder_block: str = "nonbottleneck1d"
    semantic_decoder_block_dropout_p: float = 0.2
    semantic_decoder_n_blocks: int = 3
    semantic_decoder_dropout_p: float = 0.1  # only used by segformermlp
    semantic_decoder_n_channels: Tuple[int, ...] = (512, 256, 128)
    semantic_decoder_downsamplings: Tuple[int, ...] = (16, 8, 4)
    semantic_decoder_upsampling: str = "learned-3x3-zeropad"
    semantic_encoder_decoder_fusion: str = "add-rgb"  # args.py:389

    # instance decoder (args.py:396-538)
    instance_decoder: str = "emsanet"
    instance_decoder_block: str = "nonbottleneck1d"
    instance_decoder_block_dropout_p: float = 0.2
    instance_decoder_n_blocks: int = 3
    instance_decoder_dropout_p: float = 0.1
    instance_decoder_n_channels: Tuple[int, ...] = (512, 256, 128)
    instance_decoder_downsamplings: Tuple[int, ...] = (16, 8, 4)
    instance_decoder_upsampling: str = "learned-3x3-zeropad"
    instance_encoder_decoder_fusion: str = "add-rgb"
    instance_center_sigma: int = 8  # args.py:461
    instance_center_heatmap_threshold: float = 0.1  # args.py:471
    instance_center_heatmap_nms_kernel_size: int = 17  # args.py:480
    instance_center_heatmap_apply_foreground_mask: bool = False  # args.py:489
    instance_center_heatmap_top_k: int = 64  # args.py:501
    instance_center_encoding: str = "sigmoid"  # args.py:509
    instance_offset_encoding: str = "tanh"  # args.py:519
    instance_offset_distance_threshold: Optional[int] = None  # args.py:530

    # normal decoder (args.py:546-608)
    normal_decoder: str = "emsanet"
    normal_decoder_block: str = "nonbottleneck1d"
    normal_decoder_block_dropout_p: float = 0.2
    normal_decoder_n_blocks: int = 3
    normal_decoder_dropout_p: float = 0.1
    normal_decoder_n_channels: Tuple[int, ...] = (512, 256, 128)
    normal_decoder_downsamplings: Tuple[int, ...] = (16, 8, 4)
    normal_decoder_upsampling: str = "learned-3x3-zeropad"
    normal_encoder_decoder_fusion: str = "add-rgb"

    # initialization (args.py:632, :642)
    he_init: Tuple[str, ...] = ("encoder-fusion",)
    no_zero_init_decoder_residuals: bool = False

    # per-task multiscale (side-output) supervision toggles
    # (args.py:731, :757, :782; forced off for non-emsanet decoders,
    # args.py:1382-1398)
    semantic_no_multiscale_supervision: bool = False
    instance_no_multiscale_supervision: bool = False
    normal_no_multiscale_supervision: bool = False

    # pretrained weights
    no_pretrained_backbone: bool = True
    # args.py:133: one path that initializes every encoder backbone
    # (per-modality paths below take effect after propagation)
    encoder_backbone_pretrained_weights_filepath: Optional[str] = None
    rgb_encoder_backbone_pretrained_weights_filepath: Optional[str] = None
    depth_encoder_backbone_pretrained_weights_filepath: Optional[str] = None
    rgbd_encoder_backbone_pretrained_weights_filepath: Optional[str] = None

    # --- TPU-specific (no reference analog) ---
    # compute dtype for conv/matmul inside the network; params stay f32
    compute_dtype: str = "float32"  # 'bfloat16' for inference / mixed training
    # rematerialize encoder stages + decoder modules in the backward pass
    # (jax.checkpoint): trades ~30% more FLOPs for O(stage) activation
    # memory — enables much larger per-chip batches
    remat: bool = False
    # inference-only: run stride-1 NonBottleneck1D chains (encoder stage
    # tails, decoder module block stacks) as single fused Pallas kernels
    # that keep the feature map in VMEM across blocks (ops/nbt1d_chain.py).
    # No effect on the param tree or the training path.
    fused_inference: bool = False
    # TRAIN-mode fused NBt1D conv-pair kernels with custom VJP
    # (ops/nbt1d_train.py): stride-1 chain tails run as fused
    # conv3x1+relu+conv1x3 Pallas kernels with in-kernel BN batch-stat
    # partials and a recompute-in-VMEM backward. Exact forward/grad
    # semantics at dropout_p=0; with dropout the mask stream differs
    # from the unfused path (same distribution). Param/stat trees are
    # unchanged; the train step merges sowed BN updates ('fused_bn'
    # collection). Off by default.
    fused_training: bool = False
    # with fused_training: the semantic head's final x2 upsample + the
    # full-res weighted CE run as one Pallas kernel with custom VJP
    # (ops/semantic_train_head.py) — the 196 MB/b8 full-res logits
    # tensor (and its nearest-x2 input broadcast and dlogits) never
    # materialize. Loss/grads match the unfused path to bf16 rounding
    # (tests/test_train_head.py).
    fused_train_head: bool = True
    # run the learned-3x3-zeropad x2 upsamplings in their exact polyphase
    # form during TRAINING as well (ops/polyphase_upsample.py): same math
    # (grouped conv at input resolution + depth-to-space, fully
    # differentiable), but the 4x-size nearest-upsampled intermediates
    # never materialize in the forward or backward HLO. Off by default to
    # keep the round-2 "fused flags don't touch the training graph"
    # invariant unless explicitly requested.
    train_polyphase_upsampling: bool = False
    # with fused_inference: how far the FINAL head x2 stages defer.
    # 'decode' (default): the SEMANTIC decoder emits the half-res class
    #   logits + depthwise kernel and postprocessing runs the fused
    #   Pallas upsample+decode megakernel (ops/semantic_decode.py;
    #   14.4 -> 7.3 ms at b32, e2e b32 78.0 -> 64.5 ms). The instance
    #   head stays in the forward. Best THROUGHPUT configuration.
    # 'decode-both': BOTH heads defer to their Pallas kernels
    #   (ops/semantic_decode.py + ops/instance_head.py) but the
    #   postprocessing stays in the interleaved (full-res) domain: the
    #   instance kernel's parity planes are interleaved into the legacy
    #   center/offset/orientation maps before NMS/grouping.
    # 'decode-planes': BOTH heads defer; the whole postprocessing runs
    #   in the parity-plane domain (ops/instance_head.py +
    #   postprocessing._postprocess_planes) and only final maps are
    #   interleaved. Wins at LATENCY batch sizes (b1 e2e 7.9 -> 6.1 ms)
    #   but the final-map interleave relayouts scale with batch and lose
    #   at b32 (74.6 vs 64.5 ms) — measured tools/r3_perf_probe.py.
    # 'interleave': the decoder emits the (N, H/2, W/2, 4C) polyphase
    #   conv output and postprocessing decodes it (round-3 behavior;
    #   keeps full head compute inside the forward for fwd-only
    #   benchmarking protocols).
    head_decode_fusion: str = "decode"
    # with fused_inference: run ALL dense-decoder trunks (conv_in +
    # NBt1D blocks + polyphase x2 upsample + skip fusion, 3 modules x
    # D decoders) as ONE Pallas call (ops/decoder_trunk.py) — the b1
    # whole-graph launch-count lever (VERDICT r3 #2). 'auto' engages on
    # TPU at latency batch sizes (ops.decoder_trunk.MAX_BATCH; the
    # kernel streams weights per image, so it loses at batch: v5e b1
    # e2e +2.3%, b8 -4.3%, tools/trunk_ab.py); 'on' forces it
    # (tests/A-B tools); 'off' disables.
    decoder_megakernel: str = "auto"
    # NOTE: an encoder stage-2..4 megakernel (both backbones + SE
    # fusions as one Pallas call, ops/encoder_trunk.py) was built,
    # parity-tested, measured a WASH at b1 in round 4 (95b5a4f) and a
    # clear LOSS in the round-5 landscape (tools/trunk_ab.py auto+on vs
    # auto+off: b1 fwd 2.01 -> 3.42 ms) — the kernel re-streams ~64 MB
    # of weights per image while the XLA stage graph is already ~2 ms.
    # Removed from the product package (round-5); recover from git
    # history only with evidence the XLA encoder regressed.
    # NOTE: a packed dual-encoder (rgb+depth as ONE stream of
    # feature_group_count=2 grouped convs, halving encoder launches) was
    # built, exactness-tested, and MEASURED LOSING on v5e (e823278:
    # e2e b1 6.63 vs 6.12 ms, b32 81.8 vs 71.5 ms — XLA:TPU lowers
    # grouped convs poorly). Removed from the product package; recover
    # from git history only if the grouped-conv lowering changes.

    @property
    def instance_normalized_offset(self) -> bool:
        # model.py:122-132
        return self.instance_offset_encoding in ("tanh", "relative")

    @property
    def instance_tanh_for_offset(self) -> bool:
        return self.instance_offset_encoding == "tanh"

    @property
    def instance_sigmoid_for_center(self) -> bool:
        return self.instance_center_encoding == "sigmoid"

    def task_multiscale_supervision(self, task: str) -> bool:
        """Whether `task`'s decoder trains with side-output supervision.

        Off when the per-task `--*-no-multiscale-supervision` flag is set
        or the decoder type has no side outputs (args.py:1382-1398).
        """
        if task not in ("semantic", "instance", "normal"):
            return False
        if task not in self.tasks:
            return False
        if getattr(self, f"{task}_decoder") != "emsanet":
            return False
        return not getattr(self, f"{task}_no_multiscale_supervision")

    def task_side_output_downscales(self, task: str) -> Tuple[int, ...]:
        """Side (multi-scale supervision) output downscales for one task.

        Each decoder module emits its side output at the scale it *receives*
        (before its x2 upsample): module target downscales (16, 8, 4) =>
        side outputs at (32, 16, 8). Matches the reference's `_down_{8,16,32}`
        batch keys (visualization.py:133-141).
        """
        if not self.task_multiscale_supervision(task):
            return ()
        return tuple(
            2 * d for d in getattr(self, f"{task}_decoder_downsamplings")
        )

    @property
    def side_output_downscales(self) -> Tuple[int, ...]:
        """Union of side-output downscales over all supervised tasks.

        Drives which `_down_{s}` target sub-batches the preprocessor
        generates (reference main.py:392-393 collects the union the same
        way from each decoder's `side_output_downscales`).
        """
        scales: set = set()
        for task in ("semantic", "instance", "normal"):
            scales.update(self.task_side_output_downscales(task))
        return tuple(sorted(scales, reverse=True))


@dataclass
class DataConfig:
    """Dataset composition + preprocessing/augmentation parameters."""

    dataset: str = "nyuv2"  # args.py:803; supports 'a[cam1,cam2]:b' syntax
    dataset_path: Optional[str] = None
    split: str = "train"  # args.py:822
    validation_split: str = "valid"  # args.py:997; nyuv2/sunrgbd remap to 'test'
    raw_depth: bool = False  # args.py:836 ('--raw-depth')
    aug_scale_min: float = 1.0  # args.py:843
    aug_scale_max: float = 1.4  # args.py:849
    # TPU-repo extension: drop HSV jitter + random flip from the train
    # pipeline (with aug_scale_min==max==1.0 this makes training views
    # identical to eval views — required for overfit-to-convergence
    # proofs where augs smear the memorization target).
    disable_color_flip_aug: bool = False
    batch_size: int = 8  # args.py:657
    validation_batch_size: Optional[int] = None  # defaults to 3*batch_size
    n_workers: int = 8  # args.py:861
    # args.py:865-881: one fraction, or a tuple with one fraction per
    # concatenated dataset ('0.2:1.0' CLI syntax)
    subset_train: Union[float, Tuple[float, ...]] = 1.0
    subset_deterministic: bool = False  # args.py:878
    cache_dataset: bool = False
    scannet_semantic_n_classes: int = 40  # args.py:894
    scannet_subsample: int = 50  # args.py:887
    validation_scannet_subsample: int = 100  # args.py:1030
    hypersim_subsample: int = 1  # args.py:940
    hypersim_use_old_depth_stats: bool = False  # args.py:930
    sunrgbd_depth_do_not_force_mm: bool = False  # args.py:903
    sunrgbd_instances_version: str = "panopticndt"  # args.py:910
    # reference default: unified indoor-domestic scene labels ON
    # (`--use-original-scene-labels` disables them, args.py:834;
    # data.py:178 passes `not use_original_scene_labels`)
    use_original_scene_labels: bool = False
    scene_use_indoor_domestic_labels: bool = True
    validation_scannet_benchmark_mode: bool = False  # args.py:950
    validation_full_resolution: bool = False  # args.py:955
    validation_input_height: Optional[int] = None  # args.py:963 (default input)
    validation_input_width: Optional[int] = None
    # reference flags '--semantic-class-weighting' (args.py:708) and
    # '--semantic-class-weighting-logarithmic-c' (args.py:716)
    class_weighting: str = "median-frequency"
    class_weighting_c: float = 1.02
    # --- TPU-specific (no reference analog) ---
    # loader worker pool: 'thread' (GIL-releasing native kernels, ~3x
    # ceiling) or 'process' (forked workers, the torch-DataLoader analog;
    # right on multi-core hosts feeding multi-chip training)
    worker_mode: str = "thread"
    # synthetic dataset knobs (tests/bench only)
    synthetic_n_samples: int = 16


@dataclass
class TrainConfig:
    """Optimization / loop / checkpointing parameters."""

    n_epochs: int = 500  # args.py:651
    optimizer: str = "sgd"  # args.py:664
    learning_rate: float = 0.01  # args.py:670 (scaled by batch_size/8)
    learning_rate_scheduler: str = "onecycle"  # args.py:679
    momentum: float = 0.9  # args.py:686
    weight_decay: float = 1e-4  # args.py:692
    tasks_weighting: Optional[Tuple[float, ...]] = None  # args.py:699
    instance_weighting: Tuple[float, float] = (2.0, 1.0)  # args.py:743 (center, offset)
    instance_center_loss: str = "mse"  # args.py:753
    orientation_kappa: float = 1.0  # args.py:768
    normal_loss: str = "l1"  # args.py:778
    # per-task label smoothing (args.py '--semantic-loss-label-smoothing',
    # '--scene-loss-label-smoothing'; task_helper.py:35,45)
    semantic_loss_label_smoothing: float = 0.0
    scene_loss_label_smoothing: float = 0.0
    # validation / checkpointing
    validation_skip: float = 0.0  # args.py:1004
    validation_force_interval: int = 20  # args.py:1014
    checkpointing_metrics: Tuple[str, ...] = ()  # args.py:1052 e.g. ('miou', 'miou+bacc')
    checkpointing_best_only: bool = False  # args.py:1063
    checkpointing_skip: float = 0.0  # args.py:1069
    resume_ckpt_interval: int = 20  # args.py:1108
    resume_ckpt_filepath: Optional[str] = None
    weights_filepath: Optional[str] = None
    overfit_n_batches: int = -1  # args.py:1133
    # TPU-extra: validate on the (overfit-subset) TRAIN samples through the
    # eval preprocessing path — the memorization/convergence proof for
    # overfit mode (no reference flag; reference validation always uses the
    # val split even when overfitting, args.py:1133)
    validation_on_train: bool = False
    skip_sanity_check: bool = False  # args.py:1122
    validation_only: bool = False
    visualize_validation: bool = False
    visualization_output_path: Optional[str] = None  # args.py:961
    results_basepath: str = "./results"  # args.py:46
    # run bookkeeping (args.py:1168 '--hostname', :1174 '--notes',
    # :1180 '--disable-progress-bars'); recorded into args.json
    hostname: str = ""
    notes: str = ""
    disable_progress_bars: bool = False
    # rng
    seed: int = 0
    # --- TPU-specific ---
    n_devices: Optional[int] = None  # data-parallel size; None = all local
    mixed_precision: bool = False  # bf16 compute in train step


def best_head_decode_fusion(batch_size: int,
                            with_postprocessing: bool = True) -> str:
    """Measured-best `ModelConfig.head_decode_fusion` for a batch size.

    One-process sweeps on v5e 640x480 bf16 (tools/mode_sweep.py +
    tools/decode_ab.py, two sessions):
      b1:  decode 4.53-8.34 / planes 6.27-6.15 ms (planes STABLE
           across sessions; decode swings with the Pallas-DMA drift
           regime — see CLAUDE.md timing notes)
      b2:  13.65 / 10.26    b4: 21.63 / 15.77    b8: 25.77 / 22.87
      b32: decode 58.8-73.6 / planes 73.7-74.4
    -> 'decode-planes' below 16, 'decode' at >=16 ('decode-both' ties
    'decode' at b32: 73.75 vs 73.60 in one process). Without
    postprocessing the heads must stay in the forward ('interleave')
    for fwd-only protocol comparability.
    """
    if not with_postprocessing:
        return "interleave"
    if batch_size >= 16:
        return "decode"
    return "decode-planes"


@dataclass
class EMSANetConfig:
    """Top-level config bundle with reference validation rules applied."""

    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    _validated: bool = field(default=False, repr=False, compare=False)

    def validate(self) -> "EMSANetConfig":
        m, d, t = self.model, self.data, self.train
        if self._validated:
            # normalization (LR scaling etc.) must only apply once
            return self
        self._validated = True

        for task in m.tasks:
            if task not in KNOWN_TASKS:
                raise ValueError(f"Unknown task '{task}', known: {KNOWN_TASKS}")
        for mod in m.input_modalities:
            if mod not in ("rgb", "depth", "rgbd"):
                raise ValueError(f"Unknown input modality '{mod}'")

        # orientation requires instance (args.py:1324-1327)
        if "orientation" in m.tasks and "instance" not in m.tasks:
            raise ValueError("Task 'orientation' requires task 'instance'.")

        # panoptic requires semantic + instance (args.py:1329-1336)
        if m.enable_panoptic:
            if "semantic" not in m.tasks or "instance" not in m.tasks:
                raise ValueError(
                    "Panoptic segmentation requires both 'semantic' and "
                    "'instance' tasks."
                )

        # single modality => encoder fusion none (args.py:1317-1321)
        if len(m.input_modalities) == 1 and m.encoder_fusion != "none":
            m.encoder_fusion = "none"

        if m.head_decode_fusion not in (
            "decode", "decode-both", "decode-planes", "interleave"
        ):
            raise ValueError(
                "head_decode_fusion must be 'decode', 'decode-both', "
                f"'decode-planes' or 'interleave', got "
                f"'{m.head_decode_fusion}'"
            )
        if m.decoder_megakernel not in ("off", "on", "auto"):
            raise ValueError(
                "decoder_megakernel must be 'off', 'on' or 'auto', got "
                f"'{m.decoder_megakernel}'"
            )
        # multiscale supervision forced off for decoders without side
        # outputs (args.py:1382-1398, decoders_with_ms = ('emsanet',))
        for task in ("semantic", "instance", "normal"):
            if getattr(m, f"{task}_decoder") != "emsanet":
                setattr(m, f"{task}_no_multiscale_supervision", True)

        # one pretrained-weights path for every encoder backbone
        # (args.py:133; per-modality paths win if both are given)
        if m.encoder_backbone_pretrained_weights_filepath:
            shared = m.encoder_backbone_pretrained_weights_filepath
            for mod in ("rgb", "depth", "rgbd"):
                key = f"{mod}_encoder_backbone_pretrained_weights_filepath"
                if getattr(m, key) is None:
                    setattr(m, key, shared)

        # reference scene-label polarity (args.py:834, data.py:178):
        # indoor-domestic labels are the default; `use_original_scene_labels`
        # switches back to the raw per-dataset scene lists
        if d.use_original_scene_labels:
            d.scene_use_indoor_domestic_labels = False

        # --hypersim-use-old-depth-stats (args.py:930): the v030 stats
        # live in the unvendored nicr package; prepared datasets carry
        # conversion-time stats in meta.json instead, so this build can
        # only warn (documented in PARITY.md)
        if d.hypersim_use_old_depth_stats:
            import warnings

            warnings.warn(
                "hypersim_use_old_depth_stats: v030 depth stats are not "
                "vendorable offline; the prepared meta.json stats are used "
                "instead (weights trained before Apr 2022 may need manual "
                "depth-stat overrides)."
            )

        # default task weighting (args.py:1346-1348): 1.0 per task
        if t.tasks_weighting is None:
            t.tasks_weighting = tuple(1.0 for _ in m.tasks)
        if len(t.tasks_weighting) != len(m.tasks):
            raise ValueError(
                f"tasks_weighting has {len(t.tasks_weighting)} entries but "
                f"{len(m.tasks)} tasks are enabled."
            )

        # LR scaling proportional to batch size / 8 (args.py:1338-1344)
        t.learning_rate = t.learning_rate * d.batch_size / 8

        # raw depth forced for some datasets (args.py:1374-1380)
        main_dataset = d.dataset.split(":")[0].split("[")[0]
        if main_dataset in ("cityscapes", "hypersim", "scannet"):
            d.raw_depth = True

        # valid -> test split remap for nyuv2/sunrgbd (args.py:1427-1431)
        if main_dataset in ("nyuv2", "sunrgbd") and d.validation_split == "valid":
            d.validation_split = "test"

        # validation resolution defaults to training resolution (args.py:963+)
        if d.validation_input_height is None:
            d.validation_input_height = m.input_height
        if d.validation_input_width is None:
            d.validation_input_width = m.input_width
        if d.validation_batch_size is None:
            d.validation_batch_size = 3 * d.batch_size

        return self

    # --- (de)serialization for run reproducibility (main.py:288-315) ---
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self, **kwargs) -> str:
        return json.dumps(self.to_dict(), indent=2, **kwargs)

    @classmethod
    def from_dict(cls, cfg: Dict[str, Any]) -> "EMSANetConfig":
        def _mk(klass, dd):
            fields = {f.name: f for f in dataclasses.fields(klass)}
            kwargs = {}
            for k, v in dd.items():
                if k not in fields:
                    raise ValueError(f"Unknown config field '{k}' for {klass.__name__}")
                if isinstance(v, list):
                    v = tuple(v)
                kwargs[k] = v
            return klass(**kwargs)

        return cls(
            model=_mk(ModelConfig, cfg.get("model", {})),
            data=_mk(DataConfig, cfg.get("data", {})),
            train=_mk(TrainConfig, cfg.get("train", {})),
        )

    @classmethod
    def from_json(cls, s: str) -> "EMSANetConfig":
        return cls.from_dict(json.loads(s))


def default_panoptic_config(**overrides) -> EMSANetConfig:
    """EMSANet-R34-NBt1D full multi-task config (the flagship setup).

    Tasks semantic+scene+instance+orientation with panoptic merging —
    the configuration behind the reference's headline NYUv2 numbers
    (README.md:178, BASELINE.md).
    """
    model = ModelConfig(
        tasks=("semantic", "instance", "orientation", "scene"),
        enable_panoptic=True,
    )
    cfg = EMSANetConfig(model=model)
    for key, value in overrides.items():
        obj = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        setattr(obj, parts[-1], value)
    return cfg.validate()
