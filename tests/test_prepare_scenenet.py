"""SceneNetRGBD converter on synthesized fixtures.

The fixture encodes a trajectory protobuf with a minimal hand-rolled
protobuf *writer* following pySceneNetRGBD's scenenet.proto field
numbers (Trajectories.trajectories=1; Trajectory.render_path=1,
views=2, instances=3; Instance.instance_id=1, instance_type=2,
semantic_wordnet_id=3, semantic_english=4; View.frame_num=1) — the
converter's generic wire-format decoder must recover trajectories and
instance->class mappings structurally (SURVEY.md D6).
"""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.prepare_dataset import (  # noqa: E402
    _parse_scenenet_pb,
    prepare_scenenetrgbd,
)

H, W = 20, 24


def _varint(x):
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field_varint(num, val):
    return _varint(num << 3) + _varint(val)


def _field_bytes(num, payload):
    return _varint((num << 3) | 2) + _varint(len(payload)) + payload


def _instance(inst_id, wnid=None, english=None, itype=2):
    msg = _field_varint(1, inst_id) + _field_varint(2, itype)
    if wnid:
        msg += _field_bytes(3, wnid.encode())
    if english:
        msg += _field_bytes(4, english.encode())
    return msg


def _view(frame):
    # frame_num + a pose submessage with fixed64 floats (no text)
    pose = (
        _varint((1 << 3) | 1) + np.float64(1.5).tobytes()
        + _varint((2 << 3) | 1) + np.float64(-0.25).tobytes()
    )
    return _field_varint(1, frame) + _field_bytes(2, pose)


def _trajectory(render_path, instances, frames):
    msg = _field_bytes(1, render_path.encode())
    for f in frames:
        msg += _field_bytes(2, _view(f))
    for inst in instances:
        msg += _field_bytes(3, inst)
    return msg


def _make_raw(root):
    from PIL import Image

    rng = np.random.RandomState(3)
    instances = [
        _instance(1, wnid="04256520", english="sofa"),          # sofa -> 9
        _instance(2, wnid="99999999", english="office chair"),  # kw -> 4
        _instance(3, wnid="12345678"),                          # unmapped
        _instance(4, english="wall"),                           # wall -> 12
    ]
    frames = (0, 25)
    traj = _trajectory("0/123", instances, frames)
    pb = _field_bytes(1, traj)
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    with open(os.path.join(root, "scenenet_rgbd_train_0.pb"), "wb") as fh:
        fh.write(pb)

    tdir = os.path.join(root, "train", "0", "123")
    for sub in ("photo", "depth", "instance"):
        os.makedirs(os.path.join(tdir, sub), exist_ok=True)
    inst_map = np.zeros((H, W), np.uint16)
    inst_map[:5] = 1      # sofa
    inst_map[5:10] = 2    # chair
    inst_map[10:14] = 3   # unmapped -> void
    inst_map[14:] = 4     # wall
    for f in frames:
        rgb = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
        Image.fromarray(rgb).save(os.path.join(tdir, "photo", f"{f}.jpg"))
        depth = rng.randint(500, 8000, (H, W)).astype(np.uint16)
        Image.fromarray(depth).save(os.path.join(tdir, "depth", f"{f}.png"))
        Image.fromarray(inst_map).save(
            os.path.join(tdir, "instance", f"{f}.png"))
    return inst_map


def test_parse_scenenet_pb_structural():
    with tempfile.TemporaryDirectory() as root:
        _make_raw(root)
        trajs = _parse_scenenet_pb(
            os.path.join(root, "scenenet_rgbd_train_0.pb"))
    assert len(trajs) == 1
    render_path, instances = trajs[0]
    assert render_path == "0/123"
    by_id = {i: (w, e) for i, w, e in instances}
    assert by_id[1] == ("04256520", "sofa")
    assert by_id[2] == ("99999999", "office chair")
    assert by_id[3] == ("12345678", None)
    assert by_id[4] == (None, "wall")
    # views must not be mistaken for instances
    assert set(by_id) == {1, 2, 3, 4}


def test_prepare_scenenetrgbd_end_to_end():
    from PIL import Image

    with tempfile.TemporaryDirectory() as root:
        inst_map = _make_raw(root)
        out = os.path.join(root, "prepared")
        prepare_scenenetrgbd(root, out, splits=("train",))

        base = os.path.join(out, "train")
        sids = sorted(
            os.path.splitext(f)[0] for f in os.listdir(
                os.path.join(base, "semantic_13"))
        )
        assert sids == ["0_123_0", "0_123_25"]
        sem = np.asarray(
            Image.open(os.path.join(base, "semantic_13", "0_123_0.png")))
        # NYU13: sofa=9, chair=4 (keyword fallback), void=0, wall=12
        assert (sem[:5] == 9).all()
        assert (sem[5:10] == 4).all()
        assert (sem[10:14] == 0).all()
        assert (sem[14:] == 12).all()
        inst = np.asarray(
            Image.open(os.path.join(base, "instance", "0_123_0.png")))
        np.testing.assert_array_equal(inst, inst_map)

        with open(os.path.join(out, "meta.json")) as fh:
            meta = json.load(fh)
        names = [l["name"] for l in meta["semantic_labels"]]
        assert names[0] == "void" and len(names) == 14
        assert names[9] == "sofa" and names[12] == "wall"
        assert meta["depth_stats"]["mean"] > 0

        # the prepared layout loads through the standard dataset class
        from emsanet_tpu.datasets.disk import PreparedDataset

        ds = PreparedDataset(
            dataset_name="scenenetrgbd", dataset_path=out, split="train",
            sample_keys=("identifier", "rgb", "depth", "semantic",
                         "instance"),
        )
        assert len(ds) == 2
        s = ds[0]
        assert s["rgb"].shape == (H, W, 3)
        assert s["semantic"].max() == 12
        assert ds.config.n_semantic_classes_without_void == 13


def test_wnid_map_csv_override():
    with tempfile.TemporaryDirectory() as root:
        _make_raw(root)
        csv = os.path.join(root, "map.csv")
        with open(csv, "w") as fh:
            fh.write("# wnid,name\n12345678,tv\n")
        out = os.path.join(root, "prepared")
        prepare_scenenetrgbd(root, out, splits=("train",),
                             wnid_map_csv=csv)
        from PIL import Image

        sem = np.asarray(Image.open(os.path.join(
            out, "train", "semantic_13", "0_123_0.png")))
        assert (sem[10:14] == 11).all()  # tv = 11 via CSV override
