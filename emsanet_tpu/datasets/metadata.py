"""Static label metadata for the supported datasets.

TPU-native equivalent of the per-dataset config tables in
`nicr_scene_analysis_datasets` (SURVEY.md D1/D2). Depth statistics for
NYUv2 / SUNRGB-D / Cityscapes are the well-known published ESANet/EMSANet
training statistics. Thing/stuff and orientation flags follow the
EMSANet task design (orientations only for furniture-like thing classes).

These built-ins are FALLBACKS. The authoritative metadata for a prepared
dataset is its `meta.json` (emitted by `tools/prepare_dataset.py` with the
label tables used at conversion time and depth statistics computed from
the actual training depth maps); `datasets/disk.py::PreparedDataset`
prefers it over these tables whenever present (`load_meta_config`).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

from emsanet_tpu.datasets.base import (
    DatasetConfig,
    DepthStats,
    SemanticLabel,
    SemanticLabelList,
    build_dataset_config,
    generate_distinct_colors,
)

# ---------------------------------------------------------------------------
# NYUv2 (40-class), the headline benchmark dataset (README.md:176-190)
# name, is_thing, use_orientations
_NYUV2_40 = (
    ("wall", False, False),
    ("floor", False, False),
    ("cabinet", True, True),
    ("bed", True, True),
    ("chair", True, True),
    ("sofa", True, True),
    ("table", True, True),
    ("door", True, True),
    ("window", True, False),
    ("bookshelf", True, True),
    ("picture", True, False),
    ("counter", True, False),
    ("blinds", True, False),
    ("desk", True, True),
    ("shelves", True, True),
    ("curtain", True, False),
    ("dresser", True, True),
    ("pillow", True, False),
    ("mirror", True, False),
    ("floor mat", True, False),
    ("clothes", True, False),
    ("ceiling", False, False),
    ("books", True, False),
    ("refridgerator", True, True),
    ("television", True, True),
    ("paper", True, False),
    ("towel", True, False),
    ("shower curtain", True, False),
    ("box", True, False),
    ("whiteboard", True, False),
    ("person", True, True),
    ("night stand", True, True),
    ("toilet", True, True),
    ("sink", True, True),
    ("lamp", True, False),
    ("bathtub", True, True),
    ("bag", True, False),
    ("otherstructure", True, False),
    ("otherfurniture", True, True),
    ("otherprop", True, False),
)

# SUNRGB-D 37-class label set = the first 37 NYUv2-40 classes
# (the reference exploits this for weight transfer, emsanet/weights.py:93-119)
_SUNRGBD_37 = _NYUV2_40[:37]

# indoor-domestic scene label set (scene_use_indoor_domestic_labels,
# args.py:932); void at index 0 is added by the builder
_INDOOR_DOMESTIC_SCENES = (
    "bathroom",
    "bedroom",
    "dining room",
    "discussion room",
    "hallway",
    "kitchen",
    "living room",
    "office",
    "other indoor",
)
INDOOR_DOMESTIC_SCENES = _INDOOR_DOMESTIC_SCENES

# raw scene name -> indoor-domestic class (reference
# `scene_use_indoor_domestic_labels` remap; catch-all 'other indoor')
_INDOOR_DOMESTIC_REMAP = {
    "bathroom": "bathroom",
    "bedroom": "bedroom",
    "dining room": "dining room",
    "dinette": "dining room",
    "dining area": "dining room",
    "conference room": "discussion room",
    "discussion room": "discussion room",
    "meeting room": "discussion room",
    "hallway": "hallway",
    "corridor": "hallway",
    "foyer": "hallway",
    "kitchen": "kitchen",
    "office kitchen": "kitchen",
    "living room": "living room",
    "playroom": "living room",
    "rec room": "living room",
    "recreation room": "living room",
    "office": "office",
    "home office": "office",
    "study": "office",
    "study room": "office",
    "study space": "office",
    "computer room": "office",
}


def map_scene_to_indoor_domestic(name: str) -> str:
    """Map a raw scene class name into the indoor-domestic label set."""
    name = name.strip().lower().replace("_", " ")
    if name in ("void", ""):
        return "void"
    return _INDOOR_DOMESTIC_REMAP.get(name, "other indoor")

# NYUv2 raw scene labels (27 scene categories of the full NYUv2 release)
_NYUV2_SCENES = (
    "basement",
    "bathroom",
    "bedroom",
    "bookstore",
    "cafe",
    "classroom",
    "computer lab",
    "conference room",
    "dinette",
    "dining room",
    "excercise room",
    "foyer",
    "furniture store",
    "home office",
    "home storage",
    "indoor balcony",
    "kitchen",
    "laundry room",
    "living room",
    "office",
    "office kitchen",
    "playroom",
    "printer room",
    "reception room",
    "student lounge",
    "study",
    "study room",
)

# depth statistics in raw sensor units (ESANet/EMSANet training stats)
_DEPTH_STATS = {
    "nyuv2": DepthStats(min=0.0, max=10000.0, mean=2841.94941272766,
                        std=1417.2594281672277),
    "sunrgbd": DepthStats(min=0.0, max=65528.0, mean=19025.14930492213,
                          std=9880.916071806689),
    "cityscapes": DepthStats(min=0.0, max=300.0, mean=31.715617493177906,
                             std=38.70280704497496),
    # fallback stats (superseded by the prepared dataset's meta.json, which
    # carries statistics computed from the actual training depth maps)
    "hypersim": DepthStats(min=0.0, max=65535.0, mean=6245.0, std=5340.0),
    "scannet": DepthStats(min=0.0, max=10000.0, mean=1880.0, std=1045.0),
    "scenenetrgbd": DepthStats(min=0.0, max=20000.0, mean=4006.9, std=2459.7),
    "coco": DepthStats(min=0.0, max=1.0, mean=0.5, std=0.25),
    "synthetic": DepthStats(min=0.0, max=10000.0, mean=3000.0, std=1500.0),
}


def _build_semantic_list(
    entries: Sequence[Tuple[str, bool, bool]]
) -> SemanticLabelList:
    colors = generate_distinct_colors(len(entries) + 1)
    labels = [SemanticLabel("void", False, False, (0, 0, 0))]
    for (name, is_thing, use_orient), color in zip(entries, colors[1:]):
        labels.append(SemanticLabel(name, is_thing, use_orient, color))
    return SemanticLabelList(labels)


def _build_scene_list(names: Sequence[str]) -> SemanticLabelList:
    colors = generate_distinct_colors(len(names) + 1, seed=7)
    labels = [SemanticLabel("void", False, False, (0, 0, 0))]
    for name, color in zip(names, colors[1:]):
        labels.append(SemanticLabel(name, False, False, color))
    return SemanticLabelList(labels)


def get_metadata_config(
    dataset: str,
    semantic_n_classes: Optional[int] = None,
    scene_use_indoor_domestic_labels: bool = False,
) -> DatasetConfig:
    """DatasetConfig for a dataset name (semantic + scene labels + depth)."""
    name = dataset.lower()
    if name in ("nyuv2", "synthetic", "hypersim", "scenenetrgbd"):
        semantic = _build_semantic_list(_NYUV2_40)
        scenes = (
            _INDOOR_DOMESTIC_SCENES
            if scene_use_indoor_domestic_labels or name != "nyuv2"
            else _NYUV2_SCENES
        )
    elif name == "sunrgbd":
        semantic = _build_semantic_list(_SUNRGBD_37)
        scenes = _INDOOR_DOMESTIC_SCENES
    elif name == "scannet":
        n = semantic_n_classes or 40
        if n == 40:
            semantic = _build_semantic_list(_NYUV2_40)
        else:
            semantic = _build_semantic_list(
                tuple((f"class_{i}", True, False) for i in range(1, n + 1))
            )
        scenes = _INDOOR_DOMESTIC_SCENES
    elif name == "cityscapes":
        semantic = _build_semantic_list(
            (
                ("road", False, False), ("sidewalk", False, False),
                ("building", False, False), ("wall", False, False),
                ("fence", False, False), ("pole", False, False),
                ("traffic light", False, False), ("traffic sign", False, False),
                ("vegetation", False, False), ("terrain", False, False),
                ("sky", False, False), ("person", True, False),
                ("rider", True, False), ("car", True, False),
                ("truck", True, False), ("bus", True, False),
                ("train", True, False), ("motorcycle", True, False),
                ("bicycle", True, False),
            )
        )
        scenes = ("outdoor",)
    elif name == "coco":
        semantic = _build_semantic_list(
            tuple((f"class_{i}", True, False) for i in range(1, 134))
        )
        scenes = _INDOOR_DOMESTIC_SCENES
    else:
        raise ValueError(f"No metadata for dataset '{dataset}'")

    return build_dataset_config(
        semantic_label_list=semantic,
        scene_label_list=_build_scene_list(scenes),
        depth_stats=_DEPTH_STATS.get(name, _DEPTH_STATS["synthetic"]),
    )


# ---------------------------------------------------------------------------
# meta.json: authoritative per-dataset metadata emitted at preparation time.
#
# The built-in tables above are *fallbacks* — the reference's exact
# thing/stuff, use_orientations and scene tables live inside the unvendored
# `nicr_scene_analysis_datasets` package and are not recoverable from this
# checkout, and its Hypersim/ScanNet depth stats are not published in the
# reference repo. `tools/prepare_dataset.py` therefore writes a `meta.json`
# next to the prepared splits (label tables + depth statistics computed
# from the actual training data), and `PreparedDataset` PREFERS it over
# these built-ins whenever present.


def dataset_config_to_meta(config: DatasetConfig) -> dict:
    """Serialize a DatasetConfig to the meta.json schema."""
    return {
        "version": 1,
        "semantic_labels": [
            {
                "name": l.class_name,
                "is_thing": bool(l.is_thing),
                "use_orientations": bool(l.use_orientations),
                "color": list(l.color),
            }
            for l in config.semantic_label_list
        ],
        "scene_labels": list(config.scene_label_list.class_names),
        "depth_stats": {
            "min": config.depth_stats.min,
            "max": config.depth_stats.max,
            "mean": config.depth_stats.mean,
            "std": config.depth_stats.std,
        },
    }


def dataset_config_from_meta(meta: dict) -> DatasetConfig:
    """Build a DatasetConfig from a parsed meta.json dict.

    `semantic_labels` / `scene_labels` include void at index 0.
    `depth_stats_raw` (optional) is preferred by callers loading
    depth_mode='raw' — pass the already-selected dict here.
    """
    sem = SemanticLabelList(
        [
            SemanticLabel(
                e["name"],
                bool(e.get("is_thing", False)),
                bool(e.get("use_orientations", False)),
                tuple(e.get("color", (0, 0, 0))),
            )
            for e in meta["semantic_labels"]
        ]
    )
    scene_entries = meta.get("scene_labels", ("void",))
    scene_labels = []
    colors = generate_distinct_colors(len(scene_entries), seed=7)
    for name, color in zip(scene_entries, colors):
        if isinstance(name, dict):
            name = name["name"]
        scene_labels.append(SemanticLabel(name, False, False, color))
    ds = meta["depth_stats"]
    return build_dataset_config(
        semantic_label_list=sem,
        scene_label_list=SemanticLabelList(scene_labels),
        depth_stats=DepthStats(
            min=float(ds["min"]), max=float(ds["max"]),
            mean=float(ds["mean"]), std=float(ds["std"]),
        ),
    )


def load_meta_config(
    dataset_path: str,
    split: Optional[str] = None,
    depth_mode: str = "refined",
) -> Optional[DatasetConfig]:
    """Load meta.json from a prepared dataset directory, if present.

    Search order: `<path>/<split>/meta.json`, then `<path>/meta.json`.
    Returns None when no meta file exists (callers fall back to the
    built-in tables).
    """
    candidates = []
    if split:
        candidates.append(os.path.join(dataset_path, split, "meta.json"))
    candidates.append(os.path.join(dataset_path, "meta.json"))
    for path in candidates:
        if os.path.isfile(path):
            with open(path) as fh:
                meta = json.load(fh)
            if depth_mode == "raw" and "depth_stats_raw" in meta:
                meta = dict(meta, depth_stats=meta["depth_stats_raw"])
            return dataset_config_from_meta(meta)
    return None
