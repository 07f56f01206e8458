"""Native C++ preprocessing kernels vs NumPy reference parity.

The NumPy implementations in preprocessing/transforms.py are the
behavioral reference; the C++ library must match them (bitwise for label
resizes, to float tolerance elsewhere).
"""

import numpy as np
import pytest

from emsanet_tpu import native

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason="native library unavailable"
)


def _numpy_instance_targets(semantic, instance, is_thing, sigma, normalized):
    import os

    os.environ["EMSANET_TPU_NO_NATIVE"] = "1"
    try:
        from emsanet_tpu.preprocessing import transforms

        # call the numpy body directly by disabling native
        saved_lib, saved_tried = native._LIB, native._TRIED
        native._LIB, native._TRIED = None, True
        try:
            return transforms._instance_targets(
                semantic, instance, np.asarray(is_thing, bool), sigma,
                normalized,
            )
        finally:
            native._LIB, native._TRIED = saved_lib, saved_tried
    finally:
        os.environ.pop("EMSANET_TPU_NO_NATIVE", None)


def test_instance_targets_parity():
    rng = np.random.RandomState(0)
    is_thing = np.array([False, False, True, True])
    semantic = rng.randint(0, 4, (48, 64)).astype(np.int32)
    instance = np.zeros((48, 64), np.int32)
    instance[5:20, 10:30] = 1
    instance[25:40, 40:60] = 2
    semantic[5:20, 10:30] = 2
    semantic[25:40, 40:60] = 3

    for normalized in (True, False):
        ref = _numpy_instance_targets(semantic, instance, is_thing, 8.0,
                                      normalized)
        got = native.instance_targets(semantic, instance, is_thing, 8.0,
                                      normalized)
        np.testing.assert_allclose(
            got["instance_center"], ref["instance_center"], atol=1e-5
        )
        np.testing.assert_allclose(
            got["instance_offset"], ref["instance_offset"], atol=1e-5
        )
        np.testing.assert_array_equal(
            got["instance_foreground"], ref["instance_foreground"]
        )
        np.testing.assert_array_equal(
            got["instance_center_mask"], ref["instance_center_mask"]
        )


def test_resize_nearest_parity():
    rng = np.random.RandomState(1)
    src = rng.randint(0, 1000, (37, 53)).astype(np.int32)
    got = native.resize_nearest_i32(src, 16, 24)
    ys = np.minimum((np.arange(16) + 0.5) * 37 / 16, 36).astype(np.int64)
    xs = np.minimum((np.arange(24) + 0.5) * 53 / 24, 52).astype(np.int64)
    np.testing.assert_array_equal(got, src[ys][:, xs])


def test_resize_bilinear_parity():
    rng = np.random.RandomState(2)
    src = rng.rand(33, 47, 3).astype(np.float32)

    # numpy reference from transforms (native disabled)
    saved_lib, saved_tried = native._LIB, native._TRIED
    native._LIB, native._TRIED = None, True
    try:
        from emsanet_tpu.preprocessing.transforms import _resize_bilinear

        ref = _resize_bilinear(src, 20, 30)
    finally:
        native._LIB, native._TRIED = saved_lib, saved_tried

    got = native.resize_bilinear_f32(src, 20, 30)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_normalize_parity():
    from emsanet_tpu.preprocessing.transforms import RGB_MEAN, RGB_STD

    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, (24, 32, 3)).astype(np.uint8)
    got = native.normalize_rgb(rgb, RGB_MEAN, RGB_STD)
    ref = (rgb.astype(np.float32) / 255.0 - RGB_MEAN) / RGB_STD
    np.testing.assert_allclose(got, ref, atol=1e-6)

    depth = rng.rand(24, 32).astype(np.float32) * 5000
    depth[0, 0] = 0.0
    got_d = native.normalize_depth(depth, 2000.0, 1000.0, True)
    ref_d = np.where(depth > 0, (depth - 2000.0) / 1000.0, 0.0)
    np.testing.assert_allclose(got_d, ref_d, atol=1e-5)


def test_native_speedup_instance_targets():
    """Native path should beat numpy on realistic sizes (informational)."""
    import time

    rng = np.random.RandomState(4)
    is_thing = np.zeros(41, bool)
    is_thing[3:] = True
    semantic = rng.randint(0, 41, (480, 640)).astype(np.int32)
    instance = rng.randint(0, 10, (480, 640)).astype(np.int32)

    t0 = time.perf_counter()
    for _ in range(3):
        native.instance_targets(semantic, instance, is_thing, 8.0, True)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    _numpy_instance_targets(semantic, instance, is_thing, 8.0, True)
    t_numpy = time.perf_counter() - t0
    # native runs 3 iterations; require it at least matches numpy's 1
    assert t_native < t_numpy * 3


def test_native_hsv_jitter_parity():
    """Native HSV jitter matches the numpy transform path within 1 LSB.

    -ffast-math FP contraction can flip ~1e-5 of pixels by one 8-bit step;
    the augmentation stream is otherwise identical (RNG stays in Python).
    """
    from emsanet_tpu.preprocessing.transforms import RandomHSVJitter

    if native.get_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")

    rng = np.random.RandomState(11)
    tf = RandomHSVJitter(hue_jitter=0.1, saturation_jitter=0.2,
                         value_jitter=0.15)
    n_diff = n_total = 0
    for seed in range(8):
        rgb = rng.randint(0, 256, (120, 160, 3)).astype(np.uint8)
        s_nat = {"rgb": rgb.copy(),
                 "_rng": np.random.RandomState(100 + seed)}
        s_np = {"rgb": rgb.copy(),
                "_rng": np.random.RandomState(100 + seed)}
        out_nat = tf(s_nat)["rgb"]
        import unittest.mock as mock

        with mock.patch.object(native, "hsv_jitter", lambda *a: None):
            out_np = tf(s_np)["rgb"]
        diff = np.abs(out_nat.astype(np.int32) - out_np.astype(np.int32))
        assert diff.max() <= 1
        n_diff += int((diff > 0).sum())
        n_total += diff.size
    assert n_diff / n_total < 1e-4


def test_native_resize_bilinear_u8_parity():
    """u8-in/u8-out bilinear == f32 resize + np.round + clip, exactly."""
    if native.get_lib() is None:
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(3)
    for ih, iw, oh, ow, c in ((48, 64, 67, 90, 3), (64, 48, 32, 24, 1),
                              (53, 71, 101, 33, 2)):
        src = rng.randint(0, 256, (ih, iw, c)).astype(np.uint8)
        got = native.resize_bilinear_u8(src, oh, ow)
        ref_f = native.resize_bilinear_f32(src.astype(np.float32), oh, ow)
        ref = np.clip(np.round(ref_f), 0, 255).astype(np.uint8)
        diff = np.abs(got.astype(int) - ref.astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-4
    # 2-D squeeze path
    src2 = rng.randint(0, 256, (40, 50)).astype(np.uint8)
    out2 = native.resize_bilinear_u8(src2, 80, 100)
    assert out2.shape == (80, 100)
