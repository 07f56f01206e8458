"""Hypersim raw-layout converter (tools/prepare_dataset.py) on synthetic
fixtures mirroring the documented apple-hypersim download structure."""

import json
import os
import sys
import tempfile

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

h5py = pytest.importorskip("h5py")

from tools.prepare_dataset import (  # noqa: E402
    _hypersim_planar_depth,
    prepare_hypersim,
)

H, W = 24, 32


def _write_h5(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with h5py.File(path, "w") as fh:
        fh.create_dataset("dataset", data=arr)


def _make_raw(root):
    from PIL import Image

    rows = ["scene_name,camera_name,frame_id,included_in_public_release,"
            "split_partition_name"]
    rng = np.random.RandomState(0)
    frames = []
    for scene, split in (("ai_001_001", "train"), ("ai_001_002", "val"),
                         ("ai_001_003", "test")):
        for frame in (0, 1):
            rows.append(f"{scene},cam_00,{frame},True,{split}")
            frames.append((scene, "cam_00", frame, split))
        # excluded frame must be skipped
        rows.append(f"{scene},cam_00,9,False,{split}")
    with open(os.path.join(root, "metadata_images_split_scene_v1.csv"),
              "w") as fh:
        fh.write("\n".join(rows))
    with open(os.path.join(root, "metadata_camera_trajectories.csv"),
              "w") as fh:
        fh.write("Animation,Scene type\n"
                 "ai_001_001_cam_00,living room\n"
                 "ai_001_002_cam_00,kitchen\n"
                 "ai_001_003_cam_00,living room\n")

    for scene, cam, frame, _ in frames:
        img_dir = os.path.join(root, scene, "images")
        prev = os.path.join(img_dir, f"scene_{cam}_final_preview")
        os.makedirs(prev, exist_ok=True)
        rgb = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
        Image.fromarray(rgb).save(
            os.path.join(prev, f"frame.{frame:04d}.tonemap.jpg")
        )
        geom = os.path.join(img_dir, f"scene_{cam}_geometry_hdf5")
        # constant ray distance 2 m, one NaN pixel
        dist = np.full((H, W), 2.0, np.float32)
        dist[0, 0] = np.nan
        _write_h5(os.path.join(geom, f"frame.{frame:04d}.depth_meters.hdf5"),
                  dist)
        sem = rng.randint(-1, 41, (H, W)).astype(np.int16)
        _write_h5(os.path.join(geom, f"frame.{frame:04d}.semantic.hdf5"),
                  sem)
        inst = np.zeros((H, W), np.int16)
        inst[:8] = 7
        inst[8:16] = 1234  # non-consecutive raw ids
        inst[0, :4] = -1
        _write_h5(
            os.path.join(geom, f"frame.{frame:04d}.semantic_instance.hdf5"),
            inst,
        )
        nrm = rng.uniform(-1, 1, (H, W, 3)).astype(np.float32)
        _write_h5(os.path.join(geom, f"frame.{frame:04d}.normal_cam.hdf5"),
                  nrm)
    return frames


def test_planar_depth_formula():
    dist = np.full((H, W), 2.0, np.float32)
    focal = 886.81 * (W / 1024.0)
    planar = _hypersim_planar_depth(dist, focal)
    # center pixels look nearly along the axis; corners foreshorten
    assert planar.max() <= 2.0 + 1e-5
    assert planar[H // 2, W // 2] == pytest.approx(2.0, rel=1e-3)
    corner_norm = np.sqrt((0.5 * W - 0.5) ** 2 + (0.5 * H - 0.5) ** 2
                          + focal ** 2)
    assert planar[0, 0] == pytest.approx(2.0 * focal / corner_norm,
                                         rel=1e-5)


def test_prepare_hypersim_end_to_end():
    from emsanet_tpu.datasets.disk import PreparedDataset

    with tempfile.TemporaryDirectory() as raw, \
            tempfile.TemporaryDirectory() as out:
        _make_raw(raw)
        prepare_hypersim(raw, out)

        for split, n in (("train", 2), ("valid", 2), ("test", 2)):
            ids = os.listdir(os.path.join(out, split, "rgb"))
            assert len(ids) == n, split

        keys = ("identifier", "rgb", "depth", "semantic", "instance",
                "scene", "normal")
        ds = PreparedDataset(dataset_path=out, dataset_name="hypersim",
                             split="train", sample_keys=keys)
        s = ds.load_raw(0)
        assert s["rgb"].shape == (H, W, 3)
        # planar depth in mm: center of a 2 m constant-distance map
        assert abs(s["depth"][H // 2, W // 2] - 2000.0) < 5
        assert s["depth"][0, 0] == 0.0  # NaN ray -> 0 (invalid)
        assert s["semantic"].min() >= 0 and s["semantic"].max() <= 40
        # instance ids remapped to consecutive 0..2
        assert set(np.unique(s["instance"])) <= {0, 1, 2}
        assert s["normal"].shape == (H, W, 3)
        assert np.abs(s["normal"]).max() <= 1.0 + 1e-6
        assert s["scene"] >= 1  # 'living room' resolved via meta.json

        with open(os.path.join(out, "meta.json")) as fh:
            meta = json.load(fh)
        assert meta["scene_labels"] == ["void", "kitchen", "living room"]
        assert len(meta["semantic_labels"]) == 41
        # real depth stats computed from written maps (no placeholder)
        assert 1500 < meta["depth_stats"]["mean"] < 2100


def test_prepare_hypersim_subsample():
    with tempfile.TemporaryDirectory() as raw, \
            tempfile.TemporaryDirectory() as out:
        _make_raw(raw)
        prepare_hypersim(raw, out, subsample=2)
        assert len(os.listdir(os.path.join(out, "train", "rgb"))) == 1
