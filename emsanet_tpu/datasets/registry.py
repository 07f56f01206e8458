"""Dataset registry + multi-dataset composition.

Reference: `emsanet/data.py:121-162` multi-dataset string syntax
`'sunrgbd[kv1,kv2]:scannet'` (colon-separated datasets, optional
bracketed camera filters), `get_dataset` kwargs assembly
(`data.py:166-203`), and sample-key derivation from modalities + tasks
(`data.py:229-249`).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from emsanet_tpu.config import DataConfig, ModelConfig
from emsanet_tpu.datasets.base import ConcatDataset, DatasetConfig, SceneAnalysisDataset
from emsanet_tpu.datasets.disk import PreparedDataset
from emsanet_tpu.datasets.metadata import get_metadata_config
from emsanet_tpu.datasets.synthetic import SyntheticDataset

KNOWN_DATASETS = (
    "nyuv2", "sunrgbd", "hypersim", "scannet", "cityscapes", "coco",
    "scenenetrgbd", "synthetic",
)


def parse_datasets(dataset_str: str) -> List[Dict]:
    """Parse `'name1[camA,camB]:name2'` into [{'name', 'cameras'}, ...]."""
    entries = []
    for part in dataset_str.split(":"):
        if "[" in part:
            name, rest = part.split("[", 1)
            if not rest.endswith("]"):
                raise ValueError(f"Malformed dataset spec '{part}'")
            cameras = tuple(c.strip() for c in rest[:-1].split(",") if c.strip())
        else:
            name, cameras = part, None
        name = name.strip().lower()
        if name not in KNOWN_DATASETS:
            raise ValueError(f"Unknown dataset '{name}', known: {KNOWN_DATASETS}")
        entries.append({"name": name, "cameras": cameras})
    return entries


def derive_sample_keys(
    input_modalities: Sequence[str], tasks: Sequence[str], phase: str
) -> Tuple[str, ...]:
    """Sample keys needed for modalities + tasks (data.py:229-249)."""
    keys = ["identifier"]
    if "rgb" in input_modalities or "rgbd" in input_modalities:
        keys.append("rgb")
    if "depth" in input_modalities or "rgbd" in input_modalities:
        keys.append("depth")
    if "semantic" in tasks:
        keys.append("semantic")
    if "instance" in tasks:
        keys.append("instance")
        if "semantic" not in keys:
            keys.append("semantic")  # thing/stuff needed for targets
    if "orientation" in tasks:
        keys.append("orientations")
    if "scene" in tasks:
        keys.append("scene")
    if "normal" in tasks:
        keys.append("normal")
    return tuple(keys)


def get_dataset(
    data_cfg: DataConfig,
    model_cfg: ModelConfig,
    split: str,
) -> SceneAnalysisDataset:
    """Build the (possibly concatenated) dataset for a split."""
    entries = parse_datasets(data_cfg.dataset)
    sample_keys = derive_sample_keys(
        model_cfg.input_modalities, model_cfg.tasks, split
    )

    datasets: List[SceneAnalysisDataset] = []
    paths = (data_cfg.dataset_path or "").split(":")
    if len(paths) == 1:
        paths = paths * len(entries)
    for entry, path in zip(entries, paths):
        name = entry["name"]
        if name == "synthetic":
            ds = SyntheticDataset(
                split=split,
                sample_keys=sample_keys,
                n_samples=data_cfg.synthetic_n_samples,
                height=model_cfg.input_height,
                width=model_cfg.input_width,
                use_cache=data_cfg.cache_dataset,
            )
        else:
            kwargs = {}
            if name == "scannet":
                kwargs["semantic_n_classes"] = data_cfg.scannet_semantic_n_classes
                # train vs validation subsamples differ (reference
                # data.py:278-283: --scannet-subsample for train,
                # --validation-scannet-subsample otherwise)
                kwargs["subsample"] = (
                    data_cfg.scannet_subsample if split == "train"
                    else data_cfg.validation_scannet_subsample
                )
            if name == "hypersim" and split == "train":
                kwargs["subsample"] = data_cfg.hypersim_subsample
            ds = PreparedDataset(
                dataset_path=path,
                dataset_name=name,
                split=split,
                sample_keys=sample_keys,
                depth_mode="raw" if data_cfg.raw_depth else "refined",
                use_cache=data_cfg.cache_dataset,
                cameras=entry["cameras"],
                scene_use_indoor_domestic_labels=(
                    data_cfg.scene_use_indoor_domestic_labels
                ),
                **kwargs,
            )
        datasets.append(ds)

    if len(datasets) == 1:
        return datasets[0]
    return ConcatDataset(datasets)


def get_dataset_config(data_cfg: DataConfig) -> DatasetConfig:
    """Main (first) dataset's static config.

    Prefers the prepared dataset's authoritative `meta.json` (label
    tables used at conversion time + real depth stats) when a dataset
    path is configured — the same precedence `PreparedDataset` applies —
    so the model/preprocessor/metrics see identical tables to the
    loader. Falls back to the built-in tables.
    """
    main = parse_datasets(data_cfg.dataset)[0]["name"]
    n_classes = (
        data_cfg.scannet_semantic_n_classes if main == "scannet" else None
    )
    main_path = (data_cfg.dataset_path or "").split(":")[0]
    if main_path:
        from emsanet_tpu.datasets.metadata import (
            INDOOR_DOMESTIC_SCENES,
            _build_scene_list,
            load_meta_config,
        )
        from emsanet_tpu.datasets.base import build_dataset_config

        meta = load_meta_config(
            main_path,
            depth_mode="raw" if data_cfg.raw_depth else "refined",
        )
        # an explicit class-count request must not be silently overridden
        if meta is not None and (
            n_classes is None
            or meta.n_semantic_classes_without_void == n_classes
        ):
            if data_cfg.scene_use_indoor_domestic_labels and (
                tuple(meta.scene_label_list.class_names[1:])
                != INDOOR_DOMESTIC_SCENES
            ):
                # same scene-list override PreparedDataset applies: keep
                # the authoritative semantic tables + depth stats, expose
                # the unified indoor-domestic scene classes
                meta = build_dataset_config(
                    semantic_label_list=meta.semantic_label_list,
                    scene_label_list=_build_scene_list(
                        INDOOR_DOMESTIC_SCENES
                    ),
                    depth_stats=meta.depth_stats,
                )
            return meta
    return get_metadata_config(
        main,
        semantic_n_classes=n_classes,
        scene_use_indoor_domestic_labels=(
            data_cfg.scene_use_indoor_domestic_labels
        ),
    )
