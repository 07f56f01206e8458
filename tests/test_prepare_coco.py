"""COCO panoptic converter on synthesized fixtures (RGB-encoded segment
PNGs + panoptic JSON, no pycocotools)."""

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.prepare_dataset import prepare_coco  # noqa: E402

H, W = 24, 32


def _make_raw(root):
    from PIL import Image

    rng = np.random.RandomState(0)
    img_dir = os.path.join(root, "train2017")
    ann_dir = os.path.join(root, "annotations", "panoptic_train2017")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    categories = [
        {"id": 1, "name": "person", "isthing": 1},
        {"id": 7, "name": "train", "isthing": 1},
        {"id": 200, "name": "wall", "isthing": 0},
    ]
    annotations, images = [], []
    for img_id, name in ((42, "000000000042"), (43, "000000000043")):
        rgb = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
        Image.fromarray(rgb).save(os.path.join(img_dir, name + ".jpg"))

        # segments: 300 person, 77777 train (crowd), 9 wall (stuff)
        seg_id = np.zeros((H, W), np.int32)
        seg_id[:10] = 9
        seg_id[10:18] = 300
        seg_id[18:] = 77777
        seg_rgb = np.stack(
            [seg_id % 256, (seg_id // 256) % 256, seg_id // 65536],
            axis=-1,
        ).astype(np.uint8)
        Image.fromarray(seg_rgb).save(os.path.join(ann_dir, name + ".png"))

        images.append({"id": img_id, "file_name": name + ".jpg"})
        annotations.append({
            "image_id": img_id,
            "file_name": name + ".png",
            "segments_info": [
                {"id": 9, "category_id": 200, "iscrowd": 0},
                {"id": 300, "category_id": 1, "iscrowd": 0},
                {"id": 77777, "category_id": 7, "iscrowd": 1},
            ],
        })
    with open(os.path.join(root, "annotations",
                           "panoptic_train2017.json"), "w") as fh:
        json.dump({"images": images, "annotations": annotations,
                   "categories": categories}, fh)


def test_prepare_coco_end_to_end():
    from emsanet_tpu.datasets.disk import PreparedDataset

    with tempfile.TemporaryDirectory() as raw, \
            tempfile.TemporaryDirectory() as out:
        _make_raw(raw)
        prepare_coco(raw, out, splits=("train",))

        ds = PreparedDataset(
            dataset_path=out, dataset_name="coco", split="train",
            sample_keys=("identifier", "rgb", "semantic", "instance"),
        )
        assert len(ds) == 2
        # meta.json carries the real names/isthing, contiguous 1..3
        labels = ds.config.semantic_label_list
        assert [l.class_name for l in labels[1:]] == [
            "person", "train", "wall"]
        assert [bool(l.is_thing) for l in labels[1:]] == [True, True,
                                                          False]
        s = ds.load_raw(0)
        assert s["rgb"].shape == (H, W, 3)
        # stuff wall -> class 3, person -> 1, crowd train -> 2
        assert set(np.unique(s["semantic"])) == {1, 2, 3}
        # only the non-crowd person thing gets an instance id
        assert set(np.unique(s["instance"])) == {0, 1}
        assert (s["instance"][10:18] == 1).all()
