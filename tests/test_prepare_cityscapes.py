"""Cityscapes raw-layout converter on synthesized fixtures."""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.prepare_dataset import (  # noqa: E402
    _CITYSCAPES_BF,
    prepare_cityscapes,
)

H, W = 32, 64


def _make_raw(root):
    from PIL import Image

    rng = np.random.RandomState(0)
    for raw_split, city, sid in (("train", "aachen", "aachen_000000_000019"),
                                 ("train", "aachen", "aachen_000001_000019"),
                                 ("val", "lindau", "lindau_000000_000019")):
        img_dir = os.path.join(root, "leftImg8bit", raw_split, city)
        gt_dir = os.path.join(root, "gtFine", raw_split, city)
        disp_dir = os.path.join(root, "disparity", raw_split, city)
        for d in (img_dir, gt_dir, disp_dir):
            os.makedirs(d, exist_ok=True)
        rgb = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
        Image.fromarray(rgb).save(
            os.path.join(img_dir, sid + "_leftImg8bit.png"))

        lab = np.full((H, W), 7, np.uint8)   # road -> train class 1
        lab[: H // 2] = 23                   # sky -> train class 11
        lab[0, :4] = 3                       # unmapped -> void
        Image.fromarray(lab).save(
            os.path.join(gt_dir, sid + "_gtFine_labelIds.png"))

        inst = np.zeros((H, W), np.int32)
        inst[20:28, 10:30] = 26000 + 5   # car instance (labelId*1000+k)
        inst[20:28, 40:60] = 26000 + 9   # second car
        inst[:4, :] = 23                 # stuff id < 1000 -> no instance
        Image.fromarray(inst.astype(np.uint16)).save(
            os.path.join(gt_dir, sid + "_gtFine_instanceIds.png"))

        # constant true disparity 10 px -> p = 10*256 + 1
        disp = np.full((H, W), 10 * 256 + 1, np.uint16)
        disp[0, 0] = 0  # invalid measurement
        Image.fromarray(disp).save(
            os.path.join(disp_dir, sid + "_disparity.png"))


def test_prepare_cityscapes_end_to_end():
    from emsanet_tpu.datasets.disk import PreparedDataset

    with tempfile.TemporaryDirectory() as raw, \
            tempfile.TemporaryDirectory() as out:
        _make_raw(raw)
        prepare_cityscapes(raw, out)

        assert len(os.listdir(os.path.join(out, "train", "rgb"))) == 2
        assert len(os.listdir(os.path.join(out, "valid", "rgb"))) == 1

        keys = ("identifier", "rgb", "depth", "semantic", "instance")
        ds = PreparedDataset(dataset_path=out, dataset_name="cityscapes",
                             split="train", sample_keys=keys)
        assert ds.config.n_semantic_classes_without_void == 19
        s = ds.load_raw(0)
        assert s["rgb"].shape == (H, W, 3)
        # road=1, sky=11, void=0 in the +1 train-class space
        assert set(np.unique(s["semantic"])) == {0, 1, 11}
        # two car instances -> consecutive ids 1, 2
        assert set(np.unique(s["instance"])) == {0, 1, 2}
        # depth: B*f/disp meters at disp=10 px, stored cm
        expect_cm = _CITYSCAPES_BF / 10.0 * 100.0
        assert abs(s["depth"][10, 10] - round(expect_cm)) <= 1
        assert s["depth"][0, 0] == 0.0  # invalid disparity -> 0
