"""Static label metadata for the supported datasets.

TPU-native equivalent of the per-dataset config tables in
`nicr_scene_analysis_datasets` (SURVEY.md D1/D2). Depth statistics for
NYUv2 / SUNRGB-D / Cityscapes are the well-known published ESANet/EMSANet
training statistics. Thing/stuff and orientation flags follow the
EMSANet task design (orientations only for furniture-like thing classes);
they can be overridden at runtime via `DataConfig` / JSON since the
reference's exact tables live in the (unvendored) dataset package.
"""

from __future__ import annotations

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
    # placeholder stats (datasets not exercised by the headline benchmarks)
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
