"""Preprocessing chain tests.

Analog of the reference's tests/test_interface_preprocessing.py
(SURVEY.md §4): full chain per phase, target generator correctness,
collate through the loader.
"""

import numpy as np
import pytest

from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
from emsanet_tpu.datasets.metadata import get_metadata_config
from emsanet_tpu.datasets.registry import derive_sample_keys
from emsanet_tpu.datasets.synthetic import SyntheticDataset
from emsanet_tpu.preprocessing import (
    batch_collate,
    get_preprocessor,
)
from emsanet_tpu.preprocessing.transforms import (
    InstanceClearStuffIDs,
    InstanceTargetGenerator,
    NormalizeDepth,
    RandomCrop,
    RandomHorizontalFlip,
    Resize,
    SemanticClassMapper,
)


def _cfg(tasks=("semantic", "instance", "orientation", "scene"), phase_hw=(64, 96)):
    return EMSANetConfig(
        model=ModelConfig(
            tasks=tasks,
            enable_panoptic="instance" in tasks,
            input_height=phase_hw[0],
            input_width=phase_hw[1],
        ),
        data=DataConfig(dataset="synthetic"),
    ).validate()


def _dataset(cfg, split, n=2, h=96, w=128):
    ds_config = get_metadata_config("nyuv2")
    return SyntheticDataset(
        split=split,
        sample_keys=derive_sample_keys(
            cfg.model.input_modalities, cfg.model.tasks, split
        ),
        n_samples=n, height=h, width=w, dataset_config=ds_config,
    ), ds_config


@pytest.mark.parametrize("phase", ["train", "test"])
def test_full_chain_shapes(phase):
    cfg = _cfg()
    ds, ds_config = _dataset(cfg, "train" if phase == "train" else "test")
    pp = get_preprocessor(
        cfg, ds_config, phase,
        multiscale_downscales=(32, 16, 8) if phase == "train" else None,
    )
    sample = ds.load_raw(0)
    sample["_rng"] = np.random.default_rng(0)
    out = pp(sample)

    h, w = cfg.model.input_height, cfg.model.input_width
    assert out["rgb"].shape == (h, w, 3)
    assert out["rgb"].dtype == np.float32
    assert out["depth"].shape == (h, w, 1)
    assert out["semantic"].shape == (h, w)
    assert out["instance_center"].shape == (h, w, 1)
    assert out["instance_offset"].shape == (h, w, 2)
    assert out["instance_foreground"].dtype == bool
    assert out["orientation"].shape == (h, w, 2)

    if phase == "train":
        for s in (32, 16, 8):
            sub = out[f"_down_{s}"]
            assert sub["semantic"].shape == (h // s, w // s)
            assert sub["instance_center"].shape == (h // s, w // s, 1)
    else:
        # panoptic GT generated before resize; fullres copy preserved
        assert out["panoptic"].shape == (h, w)
        assert out["panoptic_fullres"].shape == (96, 128)
        assert out["rgb_fullres"].shape == (96, 128, 3)


def test_instance_targets_center_peak_at_mass_center():
    is_thing = np.array([False, False, True])
    semantic = np.full((32, 32), 1, np.int32)
    instance = np.zeros((32, 32), np.int32)
    semantic[8:16, 8:24] = 2
    instance[8:16, 8:24] = 5
    gen = InstanceTargetGenerator(sigma=4, semantic_classes_is_thing=is_thing,
                                  normalized_offset=False)
    out = gen({"semantic": semantic, "instance": instance})
    center = out["instance_center"][..., 0]
    # peak at the mass center (11.5, 15.5) -> max in that neighborhood
    peak = np.unravel_index(center.argmax(), center.shape)
    assert abs(peak[0] - 11.5) <= 1 and abs(peak[1] - 15.5) <= 1
    # offsets point to the center from instance pixels
    off = out["instance_offset"]
    assert off[8, 8, 0] == pytest.approx(11.5 - 8)
    assert off[8, 8, 1] == pytest.approx(15.5 - 8)
    # foreground only on the thing instance
    assert out["instance_foreground"].sum() == 8 * 16
    # center mask excludes void
    semantic2 = semantic.copy()
    semantic2[0, 0] = 0
    out2 = gen({"semantic": semantic2, "instance": instance})
    assert not out2["instance_center_mask"][0, 0]


def test_clear_stuff_ids():
    is_thing = np.array([False, True, False])
    semantic = np.array([[1, 2], [1, 0]])
    instance = np.array([[3, 4], [5, 6]])
    out = InstanceClearStuffIDs(is_thing)(
        {"semantic": semantic, "instance": instance}
    )
    np.testing.assert_array_equal(out["instance"], [[3, 0], [5, 0]])


def test_class_mapper():
    sem = np.array([37, 38, 39, 40, 1])
    out = SemanticClassMapper((38, 39, 40), 0)({"semantic": sem})
    np.testing.assert_array_equal(out["semantic"], [37, 0, 0, 0, 1])


def test_hflip_flips_offsets_consistently():
    """Flip before target gen => offsets derived from flipped geometry."""
    is_thing = np.array([False, True])
    semantic = np.full((16, 16), 1, np.int32)
    instance = np.zeros((16, 16), np.int32)
    instance[4:8, 0:4] = 1  # left side
    flip = RandomHorizontalFlip(p=1.0)
    s = flip({
        "semantic": semantic.copy(), "instance": instance.copy(),
        "orientations": {1: 1.0}, "_rng": np.random.default_rng(0),
    })
    assert s["instance"][4, 12] == 1  # moved to the right side
    assert s["orientations"][1] == pytest.approx((2 * np.pi) - 1.0)


def test_normalize_depth_raw_keeps_invalid_zero():
    depth = np.array([[0.0, 1000.0]], np.float32)
    out = NormalizeDepth(500.0, 250.0, raw_depth=True)({"depth": depth})
    assert out["depth"][0, 0, 0] == 0.0
    assert out["depth"][0, 1, 0] == pytest.approx(2.0)
    out2 = NormalizeDepth(500.0, 250.0, raw_depth=False)(
        {"depth": depth.copy()}
    )
    assert out2["depth"][0, 0, 0] == pytest.approx(-2.0)


def test_resize_records_trace_and_batch_collate():
    cfg = _cfg()
    ds, ds_config = _dataset(cfg, "test", n=3)
    pp = get_preprocessor(cfg, ds_config, "test")
    samples = []
    for i in range(3):
        s = ds.load_raw(i)
        s["_rng"] = np.random.default_rng(i)
        samples.append(pp(s))
    batch = batch_collate(samples)
    assert batch["rgb"].shape == (3, 64, 96, 3)
    assert isinstance(batch["identifier"], list)
    assert isinstance(batch["orientations"], list)
    trace = samples[0]["_applied_preprocessing"]
    assert trace[0][0] == "resize"
    assert trace[0][1]["orig_height"] == 96


def test_crop_pads_small_inputs():
    crop = RandomCrop(32, 32)
    s = crop({
        "rgb": np.zeros((16, 16, 3), np.uint8),
        "semantic": np.ones((16, 16), np.int32),
        "_rng": np.random.default_rng(0),
    })
    assert s["rgb"].shape == (32, 32, 3)
    assert s["semantic"].shape == (32, 32)


def test_deterministic_rng_reproducible():
    cfg = _cfg()
    ds, ds_config = _dataset(cfg, "train")
    pp = get_preprocessor(cfg, ds_config, "train")
    a = ds.load_raw(0); a["_rng"] = np.random.default_rng(42)
    b = ds.load_raw(0); b["_rng"] = np.random.default_rng(42)
    ra, rb = pp(a), pp(b)
    np.testing.assert_array_equal(ra["rgb"], rb["rgb"])
    np.testing.assert_array_equal(ra["semantic"], rb["semantic"])


def test_pad_to_multiple_fullres_bucketing():
    """--validation-full-resolution pads to /32 buckets and metrics crop
    back via _prepad_hw (VERDICT r1 missing #7)."""
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.preprocessing import get_preprocessor
    from emsanet_tpu.preprocessing.collate import batch_collate
    from emsanet_tpu.task_helper import _pred_at_gt_resolution

    cfg = EMSANetConfig(
        model=ModelConfig(tasks=("semantic", "instance", "orientation",
                                 "scene"),
                          enable_panoptic=True,
                          input_height=96, input_width=128),
        data=DataConfig(dataset="synthetic", batch_size=2,
                        validation_full_resolution=True),
    ).validate()
    pre = get_preprocessor(cfg, get_dataset_config(cfg.data), phase="test")
    rng = np.random.RandomState(0)

    def mk(h, w):
        return {
            "identifier": ("test", "x"),
            "rgb": rng.randint(0, 255, (h, w, 3)).astype(np.uint8),
            "depth": (rng.rand(h, w) * 5000).astype(np.float32),
            "semantic": rng.randint(0, 41, (h, w)).astype(np.int32),
            "instance": rng.randint(0, 5, (h, w)).astype(np.int32),
            "orientations": {1: 0.5},
            "scene": 3,
            "_rng": np.random.default_rng(0),
        }

    s = pre(mk(530, 730))  # SUNRGB-D kv1-like resolution
    assert s["rgb"].shape[:2] == (544, 736)
    assert tuple(s["_prepad_hw"]) == (530, 730)
    assert s["semantic_fullres"].shape == (530, 730)  # GT untouched
    assert (np.asarray(s["semantic"])[530:, :] == 0).all()  # void pad

    batch = batch_collate([pre(mk(530, 730)), pre(mk(530, 730))])
    assert batch["_prepad_hw"].shape == (2, 2)
    pred = np.zeros((2, 544, 736), np.int32)
    pred_full, gt_full = _pred_at_gt_resolution(batch, pred, "semantic")
    assert pred_full.shape == gt_full.shape == (2, 530, 730)

    # already-aligned resolution: no padding, prepad still recorded
    s2 = pre(mk(480, 640))
    assert s2["rgb"].shape[:2] == (480, 640)
    assert tuple(s2["_prepad_hw"]) == (480, 640)
