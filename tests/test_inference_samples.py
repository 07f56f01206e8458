"""Kinect-v2 raw-depth path of inference_samples.py (BASELINE.json
config 1; reference inference_samples.py:108-122).

Locks the uint16-mm depth handling — the silent-bug hotspot: clip
happens BEFORE scale (threshold in raw sensor units), clipped pixels
become 0 = invalid, and raw-depth normalization keeps invalid pixels at
exactly 0 through resize + standardization into the model input.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inference_samples import prepare_raw_depth  # noqa: E402

REFERENCE_SAMPLES = "/root/reference/samples"

# the reference README's NYUv2 sample-inference invocation
# (README.md:498-513), minus the weights file (absent in this env)
NYUV2_ARGV = [
    "--dataset", "nyuv2",
    "--tasks", "semantic", "scene", "instance", "orientation",
    "--enable-panoptic",
    "--rgb-encoder-backbone", "resnet34",
    "--rgb-encoder-backbone-block", "nonbottleneck1d",
    "--depth-encoder-backbone", "resnet34",
    "--depth-encoder-backbone-block", "nonbottleneck1d",
    "--no-pretrained-backbone",
    "--input-modalities", "rgb", "depth",
    "--raw-depth",
    "--instance-offset-distance-threshold", "40",
]


def test_prepare_raw_depth_clips_before_scaling():
    # threshold is in RAW units: 10001 mm > 10000 -> invalid even though
    # the scaled value (80008) would also exceed it; 1000 mm passes and
    # is scaled afterwards
    d = np.array([[0, 1000, 10000, 10001, 65535]], np.uint16)
    out = prepare_raw_depth(d, depth_max=10000, depth_scale=8.0)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, [[0.0, 8000.0, 80000.0, 0.0, 0.0]])


def test_prepare_raw_depth_no_clip():
    d = np.array([[0, 123, 65535]], np.uint16)
    out = prepare_raw_depth(d, depth_max=None, depth_scale=1.0)
    np.testing.assert_array_equal(out, [[0.0, 123.0, 65535.0]])


def _nyuv2_cfg():
    from emsanet_tpu.utils.cli import args_to_config, build_parser

    parser = build_parser()
    # inference group flags (added by inference_samples._get_args) are
    # not needed for the config itself
    ns = parser.parse_args(NYUV2_ARGV)
    return args_to_config(ns)


def _run_preprocessor(rgb, depth):
    from emsanet_tpu.datasets.base import SampleIdentifier
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.preprocessing import batch_collate, get_preprocessor

    cfg = _nyuv2_cfg()
    ds_config = get_dataset_config(cfg.data)
    preprocessor = get_preprocessor(
        cfg, ds_config, phase="test", keep_raw_inputs=True
    )
    sample = preprocessor({
        "rgb": rgb,
        "depth": depth,
        "identifier": SampleIdentifier(("kinect_fixture",)),
    })
    return cfg, ds_config, batch_collate([sample])


def test_kinect_depth_to_model_input():
    """1440x1080 uint16-mm frame -> clip/scale -> test preprocessor ->
    (1, 480, 640, 1) standardized input with invalid pixels at 0."""
    rng = np.random.RandomState(0)
    rgb = rng.randint(0, 256, size=(1080, 1440, 3), dtype=np.uint8)
    raw = rng.randint(500, 9000, size=(1080, 1440)).astype(np.uint16)
    # a solid invalid region (Kinect depth shadows) + clipped-away pixels
    raw[:256, :256] = 0
    raw[-256:, -256:] = 12000

    depth = prepare_raw_depth(raw, depth_max=10000, depth_scale=1.0)
    cfg, ds_config, batch = _run_preprocessor(rgb, depth)

    d = np.asarray(batch["depth"])
    assert d.shape == (1, cfg.model.input_height, cfg.model.input_width, 1)
    assert d.shape[1:3] == (480, 640)
    assert d.dtype == np.float32

    # invalid pixels survive the resize as exactly 0 deep inside the
    # invalid block (away from interpolation boundaries)
    sh, sw = d.shape[1] / 1080, d.shape[2] / 1440
    inv = d[0, : int(200 * sh), : int(200 * sw), 0]
    assert inv.size > 0 and np.all(inv == 0.0)
    clipped = d[0, int(-200 * sh):, int(-200 * sw):, 0]
    assert clipped.size > 0 and np.all(clipped == 0.0)

    # valid pixels are standardized with the dataset depth stats
    stats = ds_config.depth_stats
    valid = d[0, ..., 0][d[0, ..., 0] != 0]
    assert valid.size > 0
    raw_bounds = ((500 - stats.mean) / stats.std,
                  (9000 - stats.mean) / stats.std)
    assert valid.min() >= raw_bounds[0] - 1e-4
    assert valid.max() <= raw_bounds[1] + 1e-4
    # raw inputs are preserved for visualization
    assert batch["_no_preprocessing"][0]["rgb"].shape == (1080, 1440, 3)


@pytest.mark.skipif(
    not os.path.isfile(os.path.join(REFERENCE_SAMPLES, "sample_depth.png")),
    reason="reference sample files not present",
)
def test_real_kinect_sample_files():
    """The actual /root/reference/samples Kinect-v2 pair flows through
    the NYUv2 raw-depth path (README.md:498-513 flags)."""
    from PIL import Image

    rgb = np.asarray(
        Image.open(os.path.join(REFERENCE_SAMPLES, "sample_rgb.png"))
    )[..., :3]
    raw = np.asarray(
        Image.open(os.path.join(REFERENCE_SAMPLES, "sample_depth.png"))
    )
    assert raw.dtype == np.uint16 and raw.shape == (1080, 1440)

    depth = prepare_raw_depth(raw, depth_max=10000, depth_scale=1.0)
    _, ds_config, batch = _run_preprocessor(rgb, depth)
    d = np.asarray(batch["depth"])[0, ..., 0]
    assert d.shape == (480, 640)
    # the Kinect frame has real shadows: some invalid, mostly valid
    frac_invalid = float((d == 0).mean())
    assert 0.0 < frac_invalid < 0.5
    stats = ds_config.depth_stats
    top = (float(raw.max()) - stats.mean) / stats.std
    assert d.max() <= top + 1e-3
