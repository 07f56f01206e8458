"""meta.json authority: the prepared dataset's metadata overrides built-ins.

VERDICT round-1 item 4: wrong thing/stuff bits silently corrupt the
panoptic merge/PQ/orientation masks, and the reference's exact tables are
not recoverable from this checkout — so preparation emits meta.json
(label tables + depth stats computed from real data) and the loader MUST
prefer it (`emsanet_tpu/datasets/metadata.py::load_meta_config`).
"""

import json
import os

import numpy as np
import pytest

from emsanet_tpu.datasets.disk import PreparedDataset
from emsanet_tpu.datasets.metadata import (
    dataset_config_from_meta,
    dataset_config_to_meta,
    get_metadata_config,
    map_scene_to_indoor_domestic,
)
from tests.test_datasets import _write_prepared


def test_meta_roundtrip():
    cfg = get_metadata_config("nyuv2")
    meta = dataset_config_to_meta(cfg)
    back = dataset_config_from_meta(meta)
    assert back.semantic_label_list.class_names == cfg.semantic_label_list.class_names
    assert back.semantic_label_list.classes_is_thing == cfg.semantic_label_list.classes_is_thing
    assert (
        back.semantic_label_list.classes_use_orientations
        == cfg.semantic_label_list.classes_use_orientations
    )
    assert back.scene_label_list.class_names == cfg.scene_label_list.class_names
    assert back.depth_stats == cfg.depth_stats


def test_loader_prefers_meta_over_builtin(tmp_path):
    root = _write_prepared(tmp_path)
    # tampered metadata: flip a thing bit, change a name + depth stats;
    # if the loader preferred built-ins, none of this would show up
    meta = dataset_config_to_meta(get_metadata_config("nyuv2"))
    meta["semantic_labels"][1]["name"] = "WALL_OVERRIDDEN"
    meta["semantic_labels"][1]["is_thing"] = True
    meta["depth_stats"] = {"min": 0.0, "max": 123.0, "mean": 42.0, "std": 7.0}
    meta["scene_labels"] = ["void", "sceneA", "sceneB", "sceneC"]
    with open(os.path.join(root, "meta.json"), "w") as fh:
        json.dump(meta, fh)

    ds = PreparedDataset(
        dataset_path=root, dataset_name="nyuv2", split="test",
        sample_keys=("rgb", "scene"),
    )
    cfg = ds.config
    assert cfg.semantic_label_list[1].class_name == "WALL_OVERRIDDEN"
    assert cfg.semantic_label_list[1].is_thing is True
    assert cfg.depth_stats.mean == 42.0
    assert cfg.depth_stats.std == 7.0
    # int scene files index the on-disk (meta) scene list
    assert cfg.scene_label_list.class_names == ("void", "sceneA", "sceneB",
                                                "sceneC")
    assert ds.load_raw(1)["scene"] == 2


def test_split_meta_overrides_root_meta(tmp_path):
    root = _write_prepared(tmp_path)
    meta = dataset_config_to_meta(get_metadata_config("nyuv2"))
    meta["depth_stats"] = {"min": 0, "max": 1, "mean": 11.0, "std": 1.0}
    with open(os.path.join(root, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    meta["depth_stats"] = {"min": 0, "max": 1, "mean": 22.0, "std": 2.0}
    with open(os.path.join(root, "test", "meta.json"), "w") as fh:
        json.dump(meta, fh)
    ds = PreparedDataset(dataset_path=root, dataset_name="nyuv2",
                         split="test", sample_keys=("rgb",))
    assert ds.config.depth_stats.mean == 22.0


def test_indoor_domestic_remap_with_meta(tmp_path):
    root = _write_prepared(tmp_path)
    meta = dataset_config_to_meta(get_metadata_config("nyuv2"))
    meta["scene_labels"] = ["void", "study room", "corridor", "dinette"]
    with open(os.path.join(root, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    ds = PreparedDataset(
        dataset_path=root, dataset_name="nyuv2", split="test",
        sample_keys=("scene",), scene_use_indoor_domestic_labels=True,
    )
    names = ds.config.scene_label_list.class_names
    assert "other indoor" in names and "office" in names
    # scene files store ints 1..3 into the on-disk list -> remapped
    assert names[ds.load_raw(0)["scene"]] == "office"        # study room
    assert names[ds.load_raw(1)["scene"]] == "hallway"       # corridor
    assert names[ds.load_raw(2)["scene"]] == "dining room"   # dinette


def test_scene_name_resolution_fallback(tmp_path):
    root = _write_prepared(tmp_path, n=1)
    with open(os.path.join(root, "test", "scene_class", "0000.txt"),
              "w") as fh:
        fh.write("some unknown scene")
    ds = PreparedDataset(
        dataset_path=root, dataset_name="sunrgbd", split="test",
        sample_keys=("scene",), scene_use_indoor_domestic_labels=True,
    )
    idx = ds.load_raw(0)["scene"]
    assert ds.config.scene_label_list[idx].class_name == "other indoor"


def test_map_scene_to_indoor_domestic():
    assert map_scene_to_indoor_domestic("Home_Office") == "office"
    assert map_scene_to_indoor_domestic("bathroom") == "bathroom"
    assert map_scene_to_indoor_domestic("bookstore") == "other indoor"
    assert map_scene_to_indoor_domestic("void") == "void"


def test_prepare_synthetic_emits_usable_meta(tmp_path):
    from tools.prepare_dataset import main as prepare_main

    out = str(tmp_path / "prepared")
    prepare_main(["synthetic", "--out", out, "--n-train", "2",
                  "--n-test", "1", "--height", "24", "--width", "32"])
    assert os.path.isfile(os.path.join(out, "meta.json"))
    with open(os.path.join(out, "meta.json")) as fh:
        meta = json.load(fh)
    # depth stats computed from the actually-written maps, not fallbacks
    assert meta["depth_stats"]["n_valid_pixels"] > 0
    assert meta["depth_stats"]["std"] > 0
    ds = PreparedDataset(
        dataset_path=out, dataset_name="synthetic", split="train",
        sample_keys=("rgb", "depth", "semantic", "scene"),
    )
    builtin = get_metadata_config("synthetic")
    assert ds.config.depth_stats != builtin.depth_stats
    assert len(ds.config.semantic_label_list) == len(
        builtin.semantic_label_list
    )
    s = ds.load_raw(0)
    assert s["rgb"].shape == (24, 32, 3)


def test_get_dataset_config_prefers_meta_json(tmp_path):
    """The model/preprocessor-facing config must see the prepared
    dataset's authoritative meta.json, not the built-in fallback tables
    (round-2 review finding: converters write real depth stats/label
    tables that otherwise never reached NormalizeDepth/is_thing)."""
    import json

    from emsanet_tpu.config import DataConfig
    from emsanet_tpu.datasets.registry import get_dataset_config

    meta = {
        "version": 1,
        "semantic_labels": [
            {"name": "void", "is_thing": False, "use_orientations": False,
             "color": [0, 0, 0]},
            {"name": "only-class", "is_thing": True,
             "use_orientations": False, "color": [10, 20, 30]},
        ],
        "scene_labels": ["void", "lab"],
        "depth_stats": {"min": 0.0, "max": 123.0, "mean": 42.0,
                        "std": 7.0},
    }
    (tmp_path / "meta.json").write_text(json.dumps(meta))

    cfg = get_dataset_config(
        DataConfig(dataset="nyuv2", dataset_path=str(tmp_path))
    )
    assert cfg.depth_stats.mean == 42.0  # meta, not the built-in 2841
    assert cfg.semantic_label_list[1].class_name == "only-class"

    # no path -> built-ins
    cfg2 = get_dataset_config(DataConfig(dataset="nyuv2"))
    assert cfg2.depth_stats.mean != 42.0
    assert len(cfg2.semantic_label_list) == 41

    # explicit class count that mismatches meta -> built-ins win
    cfg3 = get_dataset_config(
        DataConfig(dataset="scannet", dataset_path=str(tmp_path),
                   scannet_semantic_n_classes=20)
    )
    assert len(cfg3.semantic_label_list) == 21
