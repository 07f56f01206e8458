"""Dataset interface tests.

Analog of the reference's tests/test_interface_dataset.py (SURVEY.md §4):
iteration, caching (bit-identical repeats), camera filtering, concat
datasets, class-weight computation, prepared-layout round trip.
"""

import json
import os

import numpy as np
import pytest

from emsanet_tpu.datasets.base import ConcatDataset
from emsanet_tpu.datasets.disk import PreparedDataset
from emsanet_tpu.datasets.metadata import get_metadata_config
from emsanet_tpu.datasets.synthetic import SyntheticDataset


def test_synthetic_sample_contract():
    ds = SyntheticDataset(n_samples=3, height=64, width=96)
    assert len(ds) == 3
    s = ds[0]
    assert s["rgb"].shape == (64, 96, 3) and s["rgb"].dtype == np.uint8
    assert s["depth"].shape == (64, 96)
    assert s["semantic"].max() <= 40
    assert (np.unique(s["instance"]) >= 0).all()
    assert isinstance(s["orientations"], dict)
    assert s["identifier"].to_filename() == "train__0000"


def test_cache_bit_identical():
    ds = SyntheticDataset(n_samples=2, height=32, width=32, use_cache=True)
    a = ds.load_raw(0)
    b = ds.load_raw(0)
    np.testing.assert_array_equal(a["rgb"], b["rgb"])
    # cache returns copies: mutating one must not affect the other
    b["rgb"][:] = 0
    c = ds.load_raw(0)
    assert c["rgb"].max() > 0


def test_class_weights_modes():
    ds = SyntheticDataset(n_samples=4, height=32, width=32)
    for mode in ("median-frequency", "logarithmic", "linear", "none"):
        w = ds.semantic_compute_class_weights(weight_mode=mode)
        assert w.shape == (40,)
        assert (w >= 0).all()
    with pytest.raises(ValueError):
        ds.semantic_compute_class_weights(weight_mode="bogus")


def test_concat_dataset():
    a = SyntheticDataset(split="train", n_samples=3, height=32, width=32)
    b = SyntheticDataset(split="train", n_samples=2, height=32, width=32)
    cat = ConcatDataset([a, b])
    assert len(cat) == 5
    s_last = cat.load_raw(4)
    np.testing.assert_array_equal(s_last["rgb"], b.load_raw(1)["rgb"])


def _write_prepared(tmp_path, n=3, cameras=("kv1", "kv2")):
    from PIL import Image

    split_dir = tmp_path / "test"
    cam_map = {}
    for sub in ("rgb", "depth", "semantic_40", "instance", "orientations",
                "scene_class"):
        os.makedirs(split_dir / sub, exist_ok=True)
    for i in range(n):
        sid = f"{i:04d}"
        Image.fromarray(
            np.full((24, 32, 3), i * 10, np.uint8)
        ).save(split_dir / "rgb" / f"{sid}.png")
        Image.fromarray(
            np.full((24, 32), 1000 + i, np.uint16)
        ).save(split_dir / "depth" / f"{sid}.png")
        Image.fromarray(
            np.full((24, 32), (i % 40) + 1, np.uint8)
        ).save(split_dir / "semantic_40" / f"{sid}.png")
        Image.fromarray(
            np.zeros((24, 32), np.uint16)
        ).save(split_dir / "instance" / f"{sid}.png")
        with open(split_dir / "orientations" / f"{sid}.json", "w") as fh:
            json.dump({"1": 0.5}, fh)
        with open(split_dir / "scene_class" / f"{sid}.txt", "w") as fh:
            fh.write(str(i % 3 + 1))
        cam_map[sid] = cameras[i % len(cameras)]
    with open(split_dir / "cameras.json", "w") as fh:
        json.dump(cam_map, fh)
    return str(tmp_path)


def test_prepared_dataset_roundtrip(tmp_path):
    root = _write_prepared(tmp_path)
    ds = PreparedDataset(
        dataset_path=root, dataset_name="nyuv2", split="test",
        sample_keys=("identifier", "rgb", "depth", "semantic", "instance",
                     "orientations", "scene"),
    )
    assert len(ds) == 3
    assert set(ds.cameras) == {"kv1", "kv2"}
    s = ds.load_raw(1)
    assert s["rgb"][0, 0, 0] == 10
    assert s["depth"][0, 0] == 1001
    assert s["semantic"][0, 0] == 2
    assert s["orientations"] == {1: 0.5}
    assert s["scene"] == 2

    # camera filtering (per-camera validation, emsanet/data.py:483-487)
    ds_kv1 = PreparedDataset(
        dataset_path=root, dataset_name="nyuv2", split="test",
        sample_keys=("identifier", "rgb"),
    ).filter_camera("kv1")
    assert len(ds_kv1) == 2  # samples 0 and 2


def test_prepared_dataset_missing_split(tmp_path):
    with pytest.raises(FileNotFoundError):
        PreparedDataset(
            dataset_path=str(tmp_path), dataset_name="nyuv2", split="test",
            sample_keys=("rgb",),
        )


def test_metadata_configs_complete():
    for name in ("nyuv2", "sunrgbd", "cityscapes", "hypersim", "scannet",
                 "scenenetrgbd", "coco", "synthetic"):
        config = get_metadata_config(name)
        assert config.semantic_label_list[0].class_name == "void"
        assert not config.semantic_label_list[0].is_thing
        assert config.n_semantic_classes_without_void >= 19
        assert config.depth_stats.std > 0
    assert get_metadata_config("nyuv2").n_semantic_classes_without_void == 40
    assert get_metadata_config("sunrgbd").n_semantic_classes_without_void == 37


def test_multi_dataset_concat_via_registry():
    from emsanet_tpu.config import DataConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset

    cfg_d = DataConfig(dataset="synthetic:synthetic", synthetic_n_samples=3)
    cfg_m = ModelConfig(tasks=("semantic",), input_height=32, input_width=32)
    ds = get_dataset(cfg_d, cfg_m, "train")
    assert len(ds) == 6
    s = ds.load_raw(5)
    assert s["rgb"].shape == (32, 32, 3)


def test_subset_sampler_per_dataset_fractions():
    # per-concatenated-dataset subset fractions (args.py:865-881)
    from emsanet_tpu.data import RandomSamplerSubset

    s = RandomSamplerSubset(
        100, subset=(0.2, 1.0), deterministic=False, seed=3,
        section_lengths=(40, 60),
    )
    assert s.n_draw == 8 + 60
    idx = s.indices(epoch=0)
    assert len(idx) == 68
    first = idx[idx < 40]
    second = idx[idx >= 40]
    assert len(first) == 8 and len(np.unique(first)) == 8
    assert len(second) == 60 and len(np.unique(second)) == 60
    # non-deterministic: different subset each epoch
    assert not np.array_equal(np.sort(s.indices(0)), np.sort(s.indices(1)))
    # deterministic: identical every epoch
    sd = RandomSamplerSubset(
        100, subset=(0.2, 1.0), deterministic=True, seed=3,
        section_lengths=(40, 60),
    )
    assert np.array_equal(sd.indices(0), sd.indices(5))


def test_subset_sampler_fraction_count_mismatch():
    from emsanet_tpu.data import RandomSamplerSubset

    with pytest.raises(ValueError):
        RandomSamplerSubset(100, subset=(0.5, 0.5), section_lengths=(100,))
    with pytest.raises(ValueError):
        RandomSamplerSubset(100, subset=(0.5, 0.5), section_lengths=None)


def test_datahelper_concat_subset_fractions():
    from emsanet_tpu.data import DataHelper
    from emsanet_tpu.datasets.base import ConcatDataset
    from emsanet_tpu.datasets.synthetic import SyntheticDataset

    keys = ("identifier", "rgb", "depth")
    a = SyntheticDataset(split="train", n_samples=10, height=16, width=16,
                         sample_keys=keys)
    b = SyntheticDataset(split="train", n_samples=20, height=16, width=16,
                         sample_keys=keys)
    helper = DataHelper(
        dataset_train=ConcatDataset([a, b]),
        dataset_valid=SyntheticDataset(split="valid", n_samples=4,
                                       height=16, width=16, sample_keys=keys),
        batch_size=2, valid_batch_size=2, n_workers=1,
        subset_train=(0.5, 0.1),
    )
    assert helper.train_loader.sampler.n_draw == 5 + 2
    assert len(helper.train_loader) == 3  # drop_last: 7 // 2


def test_process_workers_match_thread_workers(tmp_path):
    """Forked process workers deliver bit-identical batches to the thread
    pool (deterministic per-(epoch,index) rngs survive the fork)."""
    from emsanet_tpu.data import DataLoader

    root = _write_prepared(tmp_path, n=6)
    keys = ("identifier", "rgb", "depth", "semantic", "instance", "scene")

    def collect(mode):
        ds = PreparedDataset(
            dataset_path=root, dataset_name="nyuv2", split="test",
            sample_keys=keys,
        )
        loader = DataLoader(
            ds, batch_size=2, shuffle=True, drop_last=False,
            n_workers=2, worker_mode=mode,
        )
        loader.n_workers = 2  # bypass the 1-core clamp for the test
        return list(loader.batches(epoch=1))

    thread_batches = collect("thread")
    process_batches = collect("process")
    assert len(thread_batches) == len(process_batches) == 3
    for bt, bp in zip(thread_batches, process_batches):
        assert set(bt) == set(bp)
        for k in bt:
            if isinstance(bt[k], np.ndarray):
                np.testing.assert_array_equal(bt[k], bp[k], err_msg=k)


def test_validation_on_train_overfit_subset():
    """--validation-on-train: val loader serves the exact overfit subset.

    The validation dataset must be the train split restricted to the
    deterministic overfit sampler indices (the convergence-proof path;
    no reference analog — reference overfit mode keeps validating on the
    val split, args.py:1133).
    """
    from emsanet_tpu.config import EMSANetConfig
    from emsanet_tpu.data import RandomSamplerSubset, get_datahelper

    cfg = EMSANetConfig()
    cfg.data.dataset = "synthetic"
    cfg.data.synthetic_n_samples = 12
    cfg.data.batch_size = 4
    cfg.data.n_workers = 1
    cfg.train.overfit_n_batches = 2
    cfg.train.validation_on_train = True

    data = get_datahelper(cfg)
    # train sampler subset = 8 of 12 samples, deterministic
    sampler = RandomSamplerSubset(
        12, subset=8 / 12, deterministic=True, seed=cfg.train.seed
    )
    expected = sorted(
        f"{i:04d}" for i in np.asarray(sampler.indices(0))
    )
    assert len(data.dataset_valid) == 8
    got = sorted(
        data.dataset_valid[i]["identifier"][-1] for i in range(8)
    )
    assert got == expected
    # identifiers come from the TRAIN split
    assert all(
        data.dataset_valid[i]["identifier"][0] == "train" for i in range(8)
    )
    # preprocessor assignment must forward through the subset view
    marker = lambda s: s  # noqa: E731
    data.set_valid_preprocessor(marker)
    assert data.dataset_valid.preprocessor is marker


def test_validation_on_train_full_split_without_overfit():
    from emsanet_tpu.config import EMSANetConfig
    from emsanet_tpu.data import get_datahelper

    cfg = EMSANetConfig()
    cfg.data.dataset = "synthetic"
    cfg.data.synthetic_n_samples = 6
    cfg.data.batch_size = 2
    cfg.data.n_workers = 1
    cfg.train.validation_on_train = True

    data = get_datahelper(cfg)
    assert len(data.dataset_valid) == 6
    assert data.dataset_valid[0]["identifier"][0] == "train"
