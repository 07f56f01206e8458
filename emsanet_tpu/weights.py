"""Weight loading with schema migration + torch->JAX conversion.

Reference: `emsanet/weights.py:11-162` (`load_weights`): transfer-loading
checkpoints across task/dataset configurations —

- drop keys the current model doesn't have (e.g. pretraining with normals,
  weights.py:68-77),
- skip scene-head weights when the scene class count differs
  (weights.py:79-91),
- reconcile semantic-head class counts: SUNRGB-D(37) <-> NYUv2/Hypersim/
  ScanNet(40) by copying the shared first 37 channels (weights.py:93-119),
- strip orientation channels from the instance head when the current model
  has no orientation task (weights.py:29-56),
- fall back to random init when shapes still mismatch (weights.py:149-160).

Plus `convert_torch_state_dict`: NCHW torch tensors -> NHWC flax params
(conv (O,I,kH,kW) -> (kH,kW,I,O); BN weight/bias -> scale/bias, running
stats -> batch_stats) for importing released PyTorch checkpoints.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        key = prefix + (k,)
        if isinstance(v, dict) or hasattr(v, "items"):
            out.update(_flatten(dict(v), key))
        else:
            out[key] = v
    return out


def _unflatten(flat):
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        node = tree
        for part in key[:-1]:
            node = node.setdefault(part, {})
        node[key[-1]] = v
    return tree


def _is_semantic_head(key: Tuple[str, ...]) -> bool:
    return (
        "semantic_decoder" in key
        and any("head_conv" in p for p in key)
    )


def _is_scene_head(key: Tuple[str, ...]) -> bool:
    return "scene_decoder" in key and "head" in key


def merge_loaded_params(
    loaded: Dict[Tuple[str, ...], np.ndarray],
    target: Dict[Tuple[str, ...], np.ndarray],
    tasks: Tuple[str, ...] = (),
    verbose: bool = True,
) -> Dict[Tuple[str, ...], np.ndarray]:
    """Apply the reference's transfer rules; returns a full target-shaped
    flat dict."""
    print_ = print if verbose else (lambda *a, **k: None)
    out = dict(target)
    for key, value in loaded.items():
        if key not in target:
            print_(f"[weights] dropping extra key {'/'.join(key)}")
            continue
        tgt = target[key]
        value = np.asarray(value)
        if value.shape == tgt.shape:
            out[key] = value
            continue

        # scene head class-count mismatch -> keep random init (wts.py:79-91)
        if _is_scene_head(key):
            print_(f"[weights] skipping scene head {'/'.join(key)}: "
                   f"{value.shape} vs {tgt.shape}")
            continue

        # semantic head 37 <-> 40 channel reconciliation (wts.py:93-119)
        if _is_semantic_head(key):
            out_axis = _output_axis(value.shape, tgt.shape)
            # ScanNet benchmark reduction 40->20 / 549->200: keep only the
            # benchmark classes' channels (weights.py:121-147)
            if out_axis is not None and (
                (value.shape[out_axis], tgt.shape[out_axis]) in
                ((40, 20), (549, 200))
            ):
                from emsanet_tpu.datasets import scannet as scannet_meta

                mapping = (
                    scannet_meta.SEMANTIC_CLASSES_40_MAPPING_TO_BENCHMARK
                    if value.shape[out_axis] == 40
                    else scannet_meta
                    .SEMANTIC_CLASSES_549_MAPPING_TO_BENCHMARK200
                )
                mask = np.array(
                    [mapping[c] != 0 for c in range(1, value.shape[out_axis] + 1)]
                )
                out[key] = np.take(value, np.flatnonzero(mask), axis=out_axis)
                print_(f"[weights] scannet benchmark reduction for "
                       f"{'/'.join(key)}: {value.shape} -> "
                       f"{out[key].shape}")
                continue
            if out_axis is not None:
                n_src = value.shape[out_axis]
                n_tgt = tgt.shape[out_axis]
                n_copy = min(n_src, n_tgt)
                new = np.array(tgt)
                src_slice = [slice(None)] * value.ndim
                dst_slice = [slice(None)] * value.ndim
                src_slice[out_axis] = slice(0, n_copy)
                dst_slice[out_axis] = slice(0, n_copy)
                new[tuple(dst_slice)] = value[tuple(src_slice)]
                print_(f"[weights] reusing {n_copy}/{n_tgt} classes in "
                       f"{'/'.join(key)}")
                out[key] = new
                continue

        # instance head orientation stripping (weights.py:29-56):
        # shared conv 96->64 channels, upsampling 5->3 channels
        if "instance_decoder" in key:
            out_axis = _output_axis(value.shape, tgt.shape)
            if out_axis is not None:
                n_tgt = tgt.shape[out_axis]
                sl = [slice(None)] * value.ndim
                sl[out_axis] = slice(0, n_tgt)
                if value.shape[out_axis] > n_tgt:
                    print_(f"[weights] truncating {'/'.join(key)} "
                           f"{value.shape} -> {tgt.shape}")
                    out[key] = value[tuple(sl)]
                    continue

        print_(f"[weights] shape mismatch for {'/'.join(key)}: "
               f"{value.shape} vs {tgt.shape}; keeping random init")
    return out


def _output_axis(src_shape, tgt_shape) -> Optional[int]:
    """Find the single axis where shapes differ (the class/channel axis)."""
    if len(src_shape) != len(tgt_shape):
        return None
    diff = [i for i, (a, b) in enumerate(zip(src_shape, tgt_shape)) if a != b]
    return diff[0] if len(diff) == 1 else None


def load_weights_file(path: str, state, cfg, verbose: bool = True):
    """Load a framework checkpoint into `state` with transfer rules."""
    from emsanet_tpu.training.checkpoint import load_checkpoint

    payload = load_checkpoint(path)
    loaded_params = _flatten(payload["params"])
    target_params = {
        k: np.asarray(v) for k, v in _flatten(dict(state.params)).items()
    }
    merged = merge_loaded_params(
        loaded_params, target_params, tasks=cfg.model.tasks, verbose=verbose
    )
    new_params = _unflatten(merged)

    loaded_stats = _flatten(payload.get("batch_stats", {}))
    target_stats = {
        k: np.asarray(v)
        for k, v in _flatten(dict(state.batch_stats)).items()
    }
    merged_stats = merge_loaded_params(
        loaded_stats, target_stats, tasks=cfg.model.tasks, verbose=False
    )
    return state.replace(
        params=new_params, batch_stats=_unflatten(merged_stats)
    )


def load_imported_npz(path: str, state, cfg, verbose: bool = True):
    """Load a checkpoint produced by tools/import_torch_checkpoint.py.

    Applies the same transfer/surgery rules as load_weights_file
    (class-count reconciliation, orientation stripping, scene-head skip).
    """
    data = np.load(path)
    loaded_params, loaded_stats = {}, {}
    for key in data.files:
        coll, rest = key.split("/", 1)
        path_t = tuple(rest.split("/"))
        (loaded_params if coll == "params" else loaded_stats)[path_t] = (
            data[key]
        )
    target_params = {
        k: np.asarray(v) for k, v in _flatten(dict(state.params)).items()
    }
    merged = merge_loaded_params(
        loaded_params, target_params, tasks=cfg.model.tasks, verbose=verbose
    )
    target_stats = {
        k: np.asarray(v)
        for k, v in _flatten(dict(state.batch_stats)).items()
    }
    merged_stats = merge_loaded_params(
        loaded_stats, target_stats, tasks=cfg.model.tasks, verbose=False
    )
    return state.replace(
        params=_unflatten(merged), batch_stats=_unflatten(merged_stats)
    )


# ---------------------------------------------------------------------------
# torch -> JAX conversion


def convert_torch_tensor(name: str, tensor) -> np.ndarray:
    """Convert one torch tensor to the flax layout."""
    arr = np.asarray(tensor.detach().cpu().numpy() if hasattr(tensor, "detach")
                     else tensor)
    if arr.ndim == 4:  # conv OIHW -> HWIO
        return np.transpose(arr, (2, 3, 1, 0))
    if arr.ndim == 2:  # linear (out, in) -> (in, out)
        return arr.T
    return arr


def convert_torch_state_dict(
    state_dict: Dict[str, Any],
    name_map: Dict[str, Tuple[str, ...]],
) -> Dict[Tuple[str, ...], np.ndarray]:
    """Convert a torch state dict given torch-name -> flax-path mapping.

    Depthwise convs: torch (C,1,kH,kW) -> flax (kH,kW,1,C) — the generic
    OIHW->HWIO transpose already handles this. BatchNorm mapping:
    weight->scale, bias->bias, running_mean->mean, running_var->var.
    """
    out = {}
    for torch_name, flax_path in name_map.items():
        if torch_name not in state_dict:
            continue
        out[flax_path] = convert_torch_tensor(
            torch_name, state_dict[torch_name]
        )
    return out


def resnet_torch_name_map(
    prefix: str,
    stage_blocks: Tuple[int, ...],
    bottleneck: bool = False,
) -> Dict[str, Tuple[str, ...]]:
    """torchvision-style ResNet state-dict names -> our backbone paths.

    Supports ImageNet initialization of the basicblock/bottleneck encoder
    variants (reference `pretrained=...`, emsanet/model.py:56). Keys are
    split into params ('.weight'/'.bias' of convs/bns) and batch_stats
    ('running_mean'/'running_var'); the caller routes by suffix.
    """
    m: Dict[str, Tuple[str, ...]] = {}

    def bn(torch_prefix, flax_path):
        m[f"{torch_prefix}.weight"] = flax_path + ("scale",)
        m[f"{torch_prefix}.bias"] = flax_path + ("bias",)
        m[f"{torch_prefix}.running_mean"] = flax_path + ("mean",)
        m[f"{torch_prefix}.running_var"] = flax_path + ("var",)

    stem = (f"{prefix}_stem",)
    m["conv1.weight"] = stem + ("Conv_0", "kernel")
    bn("bn1", stem + ("Norm_0", "BatchNorm_0"))

    for li, n_blocks in enumerate(stage_blocks):
        for b in range(n_blocks):
            t = f"layer{li + 1}.{b}"
            f = (f"{prefix}_stage{li}", f"block{b}")
            if bottleneck:
                m[f"{t}.conv1.weight"] = f + ("ConvNormAct_0", "Conv_0",
                                              "kernel")
                bn(f"{t}.bn1", f + ("ConvNormAct_0", "Norm_0", "BatchNorm_0"))
                m[f"{t}.conv2.weight"] = f + ("ConvNormAct_1", "Conv_0",
                                              "kernel")
                bn(f"{t}.bn2", f + ("ConvNormAct_1", "Norm_0", "BatchNorm_0"))
                m[f"{t}.conv3.weight"] = f + ("Conv_0", "kernel")
                bn(f"{t}.bn3", f + ("Norm_0", "BatchNorm_0"))
            else:
                m[f"{t}.conv1.weight"] = f + ("ConvNormAct_0", "Conv_0",
                                              "kernel")
                bn(f"{t}.bn1", f + ("ConvNormAct_0", "Norm_0", "BatchNorm_0"))
                m[f"{t}.conv2.weight"] = f + ("Conv_0", "kernel")
                bn(f"{t}.bn2", f + ("Norm_0", "BatchNorm_0"))
            m[f"{t}.downsample.0.weight"] = f + ("Conv_1", "kernel")
            bn(f"{t}.downsample.1", f + ("Norm_1", "BatchNorm_0"))
    return m


def load_backbone_pretrained(
    state,
    filepath: str,
    modality: str,
    backbone_name: str,
    verbose: bool = True,
):
    """Initialize one encoder backbone from a torch ResNet checkpoint.

    The depth stem (1 input channel) sums the RGB filters of conv1 — the
    standard single-channel adaptation the reference family uses for the
    depth encoder. Only matching shapes are copied; NBt1D backbones need
    NBt1D-pretrained checkpoints (shape mismatches are reported+skipped).
    """
    import torch

    from emsanet_tpu.models.backbone import get_backbone_spec

    raw = torch.load(filepath, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]

    spec = get_backbone_spec(backbone_name)
    name_map = resnet_torch_name_map(
        modality, spec.stage_blocks, spec.bottleneck
    )
    converted = convert_torch_state_dict(raw, name_map)

    params = {k: np.asarray(v) for k, v in _flatten(dict(state.params)).items()}
    stats = {
        k: np.asarray(v)
        for k, v in _flatten(dict(state.batch_stats)).items()
    }
    print_ = print if verbose else (lambda *a, **k: None)
    n_loaded = 0
    for path, value in converted.items():
        full = ("encoder",) + path
        is_stat = path[-1] in ("mean", "var")
        target = stats if is_stat else params
        if full not in target:
            continue
        if value.shape != target[full].shape:
            # depth stem: 3-channel conv1 -> 1-channel (sum over input)
            if (
                path[-1] == "kernel"
                and value.ndim == 4
                and value.shape[:2] == target[full].shape[:2]
                and target[full].shape[2] == 1
                and value.shape[2] == 3
            ):
                value = value.sum(axis=2, keepdims=True)
            else:
                print_(f"[weights] skip {'/'.join(full)}: {value.shape} vs "
                       f"{target[full].shape}")
                continue
        target[full] = value.astype(target[full].dtype)
        n_loaded += 1
    print_(f"[weights] backbone '{modality}': loaded {n_loaded} tensors "
           f"from {filepath}")
    return state.replace(
        params=_unflatten(params), batch_stats=_unflatten(stats)
    )
