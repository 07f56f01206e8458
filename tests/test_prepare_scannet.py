"""ScanNet raw-layout converter on synthesized fixtures (.sens v4 stream,
label/instance zips, combined-labels tsv, official split lists)."""

import io
import os
import struct
import sys
import tempfile
import zipfile
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.prepare_dataset import (  # noqa: E402
    _parse_sens,
    _scannet_label_map,
    prepare_scannet,
)

DW, DH = 32, 24  # depth (geometric reference)
CW, CH = 64, 48  # color (higher res, gets resampled down)


def _write_sens(path, frames):
    """Minimal valid .sens v4: jpeg color + zlib'ed uint16 depth."""
    from PIL import Image

    buf = io.BytesIO()
    buf.write(struct.pack("<I", 4))
    name = b"fixture"
    buf.write(struct.pack("<Q", len(name)))
    buf.write(name)
    buf.write(struct.pack("<64f", *([0.0] * 64)))  # 4x 4x4 matrices
    buf.write(struct.pack("<i", 2))  # color: jpeg
    buf.write(struct.pack("<i", 1))  # depth: zlib_ushort
    buf.write(struct.pack("<4I", CW, CH, DW, DH))
    buf.write(struct.pack("<f", 1000.0))  # depth_shift (mm)
    buf.write(struct.pack("<Q", len(frames)))
    for rgb, depth in frames:
        buf.write(struct.pack("<16f", *([0.0] * 16)))
        buf.write(struct.pack("<QQ", 0, 0))
        img = io.BytesIO()
        Image.fromarray(rgb).save(img, format="JPEG")
        color_bytes = img.getvalue()
        depth_bytes = zlib.compress(depth.astype("<u2").tobytes())
        buf.write(struct.pack("<QQ", len(color_bytes), len(depth_bytes)))
        buf.write(color_bytes)
        buf.write(depth_bytes)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())


def _write_label_zip(path, inner_dir, arrays):
    from PIL import Image

    with zipfile.ZipFile(path, "w") as zf:
        for idx, arr in arrays.items():
            img = io.BytesIO()
            Image.fromarray(arr).save(img, format="PNG")
            zf.writestr(f"{inner_dir}/{idx}.png", img.getvalue())


def _make_raw(root, n_frames=4):
    rng = np.random.RandomState(0)
    scene = "scene0000_00"
    sdir = os.path.join(root, "scans", scene)
    frames = []
    for _ in range(n_frames):
        rgb = rng.randint(0, 255, (CH, CW, 3)).astype(np.uint8)
        depth = (rng.rand(DH, DW) * 5000).astype(np.uint16)
        frames.append((rgb, depth))
    _write_sens(os.path.join(sdir, scene + ".sens"), frames)

    # raw scannet label ids 0/1/3/1357 -> nyu40 via tsv below
    labels = {
        i: np.full((DH, DW), [1, 3, 1357, 0][i % 4], np.uint16)
        for i in range(n_frames)
    }
    _write_label_zip(os.path.join(sdir, scene + "_2d-label-filt.zip"),
                     "label-filt", labels)
    insts = {
        i: (np.arange(DH * DW, dtype=np.uint16).reshape(DH, DW) % 3)
        for i in range(n_frames)
    }
    _write_label_zip(os.path.join(sdir, scene + "_2d-instance-filt.zip"),
                     "instance-filt", insts)

    with open(os.path.join(sdir, scene + ".txt"), "w") as fh:
        fh.write("sceneType = Living Room\n")

    with open(os.path.join(root, "scannetv2-labels.combined.tsv"),
              "w") as fh:
        fh.write("id\traw_category\tnyu40id\tnyu40class\n"
                 "1\twall\t1\twall\n"
                 "3\tchair\t5\tchair\n"
                 "1357\twidget\t40\totherprop\n")
    with open(os.path.join(root, "scannetv2_train.txt"), "w") as fh:
        fh.write(scene + "\n")
    return frames


def test_parse_sens_roundtrip():
    with tempfile.TemporaryDirectory() as root:
        frames = _make_raw(root, n_frames=3)
        sens = os.path.join(root, "scans", "scene0000_00",
                            "scene0000_00.sens")
        parsed = list(_parse_sens(sens))
        assert len(parsed) == 3
        for (idx, color, kind, depth), (rgb, d0) in zip(parsed, frames):
            assert kind == "jpeg"
            np.testing.assert_array_equal(depth, d0)  # zlib u16 roundtrip


def test_label_map_tsv():
    with tempfile.TemporaryDirectory() as root:
        _make_raw(root)
        m = _scannet_label_map(
            os.path.join(root, "scannetv2-labels.combined.tsv")
        )
        assert m[1] == 1 and m[3] == 5 and m[1357] == 40 and m[0] == 0


def test_prepare_scannet_end_to_end():
    from emsanet_tpu.datasets.disk import PreparedDataset

    with tempfile.TemporaryDirectory() as root, \
            tempfile.TemporaryDirectory() as out:
        _make_raw(root, n_frames=4)
        prepare_scannet(root, out, splits=("train",), subsample=2)

        ids = sorted(os.listdir(os.path.join(out, "train", "rgb")))
        assert len(ids) == 2  # every 2nd of 4 frames

        keys = ("identifier", "rgb", "depth", "semantic", "instance",
                "scene")
        ds = PreparedDataset(dataset_path=out, dataset_name="scannet",
                             split="train", sample_keys=keys)
        s = ds.load_raw(0)
        assert s["rgb"].shape == (DH, DW, 3)  # resampled to depth res
        assert s["depth"].shape == (DH, DW)
        # frame 0 label raw-id 1 -> nyu40 wall (1)
        assert set(np.unique(s["semantic"])) == {1}
        # frame 2 (second exported) raw-id 1357 -> nyu40 40
        s2 = ds.load_raw(1)
        assert set(np.unique(s2["semantic"])) == {40}
        assert set(np.unique(s["instance"])) == {0, 1, 2}
        assert s["scene"] == 1  # 'living room' via meta.json
