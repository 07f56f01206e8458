"""Packed raw-binary dataset format (tools/pack_dataset.py) roundtrip."""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emsanet_tpu.datasets.disk import PreparedDataset  # noqa: E402
from tools.pack_dataset import pack_split  # noqa: E402
from tools.prepare_dataset import prepare_synthetic  # noqa: E402

KEYS = ("identifier", "rgb", "depth", "semantic", "instance",
        "orientations", "scene")


def _make(tmp, n=4, h=48, w=64):
    prepare_synthetic(tmp, n, 1, h, w)
    assert pack_split(tmp, "train")
    assert pack_split(tmp, "test")


def test_packed_roundtrip_bitexact():
    with tempfile.TemporaryDirectory() as tmp:
        _make(tmp)
        ds_png = PreparedDataset(dataset_path=tmp, dataset_name="synthetic",
                                 split="train", sample_keys=KEYS,
                                 use_packed=False)
        ds_pak = PreparedDataset(dataset_path=tmp, dataset_name="synthetic",
                                 split="train", sample_keys=KEYS)
        assert ds_pak._packed is not None, "packed index not detected"
        assert len(ds_png) == len(ds_pak)
        for i in range(len(ds_png)):
            a, b = ds_png.load_raw(i), ds_pak.load_raw(i)
            assert a.keys() == b.keys()
            for k in a:
                if isinstance(a[k], np.ndarray):
                    assert a[k].dtype == b[k].dtype, k
                    np.testing.assert_array_equal(a[k], b[k], err_msg=k)
                else:
                    assert a[k] == b[k], k


def test_packed_feeds_train_pipeline():
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.data import DataLoader
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.preprocessing import get_preprocessor

    with tempfile.TemporaryDirectory() as tmp:
        _make(tmp)
        ds = PreparedDataset(dataset_path=tmp, dataset_name="synthetic",
                             split="train", sample_keys=KEYS)
        cfg = EMSANetConfig(
            model=ModelConfig(
                tasks=("semantic", "instance", "orientation", "scene"),
                enable_panoptic=True, input_height=48, input_width=64,
            ),
            data=DataConfig(dataset="synthetic", batch_size=2),
        ).validate()
        ds.preprocessor = get_preprocessor(
            cfg, get_dataset_config(cfg.data), phase="train"
        )
        loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True,
                            n_workers=2)
        batches = list(loader.batches(0))
        assert len(batches) == 2
        for b in batches:
            assert b["rgb"].shape == (2, 48, 64, 3)
            assert b["_valid_mask"].all()
            assert np.isfinite(b["rgb"]).all()
