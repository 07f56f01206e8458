"""Complete torch-key -> flax-path map for the EMSANet flagship graph.

Covers every parameter and batch-stat leaf of the flax model
(models/emsanet.py) for dense decoders + NBt1D backbones. Torch keys
follow the reference family's observable conventions
(/root/reference/emsanet/weights.py:22-56: 'encoder.*',
'decoders.<task>_decoder.*', instance head 'head.shared_conv',
'head.task_convs.{t}', 'head.upsampling'); interior names not visible in
the reference checkout (the L3 package is an unvendored submodule) are
fixed by `torch_compat.mirror.TorchEMSANet` and can be re-keyed at import
time via the rename layer in tools/import_torch_checkpoint.py.

Path convention: values are flax paths as tuples; leaves ending in
('mean'|'var') belong to the 'batch_stats' collection, everything else to
'params' (same routing rule as weights.resnet_torch_name_map).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

FlaxPath = Tuple[str, ...]
NameMap = Dict[str, FlaxPath]


def _bn(m: NameMap, t: str, f: FlaxPath) -> None:
    m[f"{t}.weight"] = f + ("scale",)
    m[f"{t}.bias"] = f + ("bias",)
    m[f"{t}.running_mean"] = f + ("mean",)
    m[f"{t}.running_var"] = f + ("var",)


def _conv(m: NameMap, t: str, f: FlaxPath, bias: bool = True) -> None:
    m[f"{t}.weight"] = f + ("kernel",)
    if bias:
        m[f"{t}.bias"] = f + ("bias",)


def _nbt1d(
    m: NameMap, t: str, f: FlaxPath,
    shortcut: bool, zero_init: bool,
) -> None:
    """NonBottleneck1D (models/layers.py): conv3x1_1, conv1x3_1, bn1,
    conv3x1_2, conv1x3_2, bn2 [, downsample]. flax auto-names:
    Conv_0..Conv_3, Norm_0; second bn is Norm_1 normally but a bare
    BatchNorm_0 in the zero-init-residual variant; shortcut is
    Conv_4 + Norm_2 (Norm_1 when zero-init)."""
    _conv(m, f"{t}.conv3x1_1", f + ("Conv_0",))
    _conv(m, f"{t}.conv1x3_1", f + ("Conv_1",))
    _bn(m, f"{t}.bn1", f + ("Norm_0", "BatchNorm_0"))
    _conv(m, f"{t}.conv3x1_2", f + ("Conv_2",))
    _conv(m, f"{t}.conv1x3_2", f + ("Conv_3",))
    if zero_init:
        _bn(m, f"{t}.bn2", f + ("BatchNorm_0",))
        norm_i = 1
    else:
        _bn(m, f"{t}.bn2", f + ("Norm_1", "BatchNorm_0"))
        norm_i = 2
    if shortcut:
        _conv(m, f"{t}.downsample.0", f + ("Conv_4",), bias=False)
        _bn(m, f"{t}.downsample.1", f + (f"Norm_{norm_i}", "BatchNorm_0"))


def _conv_norm_act(m: NameMap, t: str, f: FlaxPath) -> None:
    """ConvNormAct: conv (no bias) + bn."""
    _conv(m, f"{t}.conv", f + ("Conv_0",), bias=False)
    _bn(m, f"{t}.norm", f + ("Norm_0", "BatchNorm_0"))


def _se(m: NameMap, t: str, f: FlaxPath) -> None:
    """SqueezeExcitation: Dense_0 / Dense_1."""
    m[f"{t}.fc1.weight"] = f + ("Dense_0", "kernel")
    m[f"{t}.fc1.bias"] = f + ("Dense_0", "bias")
    m[f"{t}.fc2.weight"] = f + ("Dense_1", "kernel")
    m[f"{t}.fc2.bias"] = f + ("Dense_1", "bias")


def _backbone(
    m: NameMap, t_prefix: str, f_prefix: str,
    stage_blocks: Sequence[int],
) -> None:
    _conv(m, f"{t_prefix}.stem.conv", (f"{f_prefix}_stem", "Conv_0"),
          bias=False)
    _bn(m, f"{t_prefix}.stem.bn", (f"{f_prefix}_stem", "Norm_0",
                                   "BatchNorm_0"))
    for si, n_blocks in enumerate(stage_blocks):
        for b in range(n_blocks):
            # stage 0 keeps 1/4 (stride 1, same channels as stem): no
            # shortcut anywhere; stages 1-3: first block is strided
            shortcut = si > 0 and b == 0
            _nbt1d(
                m, f"{t_prefix}.layer{si + 1}.{b}",
                (f"{f_prefix}_stage{si}", f"block{b}"),
                shortcut=shortcut, zero_init=False,
            )


def _decoder_module(
    m: NameMap, t: str, f: FlaxPath, with_skip_proj: bool
) -> None:
    _conv_norm_act(m, f"{t}.conv3x3", f + ("conv_in",))
    for b in range(3):
        _nbt1d(m, f"{t}.blocks.{b}", f + (f"block{b}",),
               shortcut=False, zero_init=True)
    _conv(m, f"{t}.side_output", f + ("side_output",))
    _conv(m, f"{t}.upsample.conv", f + ("upsample", "depthwise"),
          bias=False)
    if with_skip_proj:
        _conv(m, f"{t}.skip_fusion.conv", f + ("skip_fusion", "proj"),
              bias=False)
        _bn(m, f"{t}.skip_fusion.norm",
            f + ("skip_fusion", "Norm_0", "BatchNorm_0"))


def emsanet_torch_name_map(
    stage_blocks: Sequence[int] = (3, 4, 6, 3),
    tasks: Sequence[str] = ("semantic", "instance", "orientation", "scene"),
    n_ppm_branches: int = 2,
    dual_encoder: bool = True,
) -> NameMap:
    """Build the full map. Returns {torch_key: flax_path}."""
    m: NameMap = {}

    if dual_encoder:
        _backbone(m, "encoder.rgb", "rgb", stage_blocks)
        _backbone(m, "encoder.depth", "depth", stage_blocks)
        for i in range(5):  # stem + 4 stages
            _se(m, f"encoder.fusions.{i}.se_main",
                ("fusion" + str(i), "se_main"))
            _se(m, f"encoder.fusions.{i}.se_other",
                ("fusion" + str(i), "se_other"))
        # fusions live under encoder/ in the flax tree
        for k in list(m):
            if m[k][0].startswith(("rgb", "depth", "fusion")):
                m[k] = ("encoder",) + m[k]
    else:
        _backbone(m, "encoder.rgb", "rgb", stage_blocks)
        for k in list(m):
            if m[k][0].startswith("rgb"):
                m[k] = ("encoder",) + m[k]

    for bi in range(n_ppm_branches):
        _conv_norm_act(m, f"context_module.branches.{bi}",
                       ("context_module", f"branch{bi}"))
    _conv_norm_act(m, "context_module.fuse", ("context_module", "fuse"))

    dense_tasks = [t for t in ("semantic", "instance") if t in tasks]
    for task in dense_tasks:
        tp = f"decoders.{task}_decoder"
        fp = f"{task}_decoder"
        for i in range(3):
            _decoder_module(m, f"{tp}.decoder_modules.{i}",
                            (fp, f"module{i}"), with_skip_proj=True)
        if task == "semantic":
            _conv(m, f"{tp}.head.conv", (fp, "head_conv"))
        else:
            _conv_norm_act(m, f"{tp}.head.shared_conv",
                           (fp, "head_shared_conv"))
            n_sub = 3 if "orientation" in tasks else 2
            for t_i in range(n_sub):
                _conv(m, f"{tp}.head.task_convs.{t_i}",
                      (fp, f"head_task_conv{t_i}"))
        for ui in range(2):
            _conv(m, f"{tp}.head.upsampling.{ui}",
                  (fp, "head_upsampling", f"up{ui}", "depthwise"),
                  bias=False)

    if "scene" in tasks:
        m["decoders.scene_decoder.head.weight"] = (
            "scene_decoder", "head", "kernel")
        m["decoders.scene_decoder.head.bias"] = (
            "scene_decoder", "head", "bias")
    return m
