"""Surface-normal task: forward contract + loss + helper."""

import jax
import jax.numpy as jnp
import numpy as np

from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
from emsanet_tpu.datasets.metadata import get_metadata_config
from emsanet_tpu.losses import get_total_loss_key
from emsanet_tpu.models import EMSANet, init_model
from emsanet_tpu.task_helper import NormalTaskHelper
from emsanet_tpu.training.step import compute_losses


def test_normal_forward_and_loss():
    h = w = 64
    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("normal",), input_height=h, input_width=w,
            rgb_encoder_backbone="resnet18", depth_encoder_backbone="resnet18",
        ),
        data=DataConfig(dataset="synthetic"),
    ).validate()
    model = EMSANet(cfg=cfg.model, dataset_config=get_metadata_config("nyuv2"))
    variables = init_model(model, jax.random.PRNGKey(0))
    batch = {
        "rgb": jnp.ones((1, h, w, 3), jnp.float32),
        "depth": jnp.ones((1, h, w, 1), jnp.float32),
    }
    out = model.apply(variables, batch, train=False)
    normal = np.asarray(out["normal"]["normal"])
    assert normal.shape == (1, h, w, 3)
    # unit-norm output
    np.testing.assert_allclose(
        np.linalg.norm(normal, axis=-1), 1.0, atol=1e-3
    )

    target = np.zeros((1, h, w, 3), np.float32)
    target[..., 2] = 1.0
    losses = compute_losses(
        out, {"normal": jnp.asarray(target)}, cfg.model
    )
    assert get_total_loss_key("normal") in losses
    assert np.isfinite(float(losses[get_total_loss_key("normal")]))


def test_normal_task_helper():
    helper = NormalTaskHelper()
    helper.initialize()
    pred = np.zeros((2, 4, 4, 3), np.float32)
    pred[..., 2] = 1.0
    target = pred.copy()
    target[1, ..., 2] = 0.0
    target[1, ..., 0] = 1.0  # 90 degrees off
    helper.validation_step(
        {"normal": target}, {"normal": pred}
    )
    _, logs = helper.validation_epoch_end()
    assert logs["normal_mae_deg"] == 45.0  # half perfect, half 90 deg


# ---------------------------------------------------------------------------
# NYUv2 converter normals (tools/prepare_dataset.py::normals_from_depth)


def _prepare_tools():
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(__file__), "..", "tools")
    )
    import prepare_dataset

    return prepare_dataset


def test_normals_from_depth_frontal_wall():
    pd = _prepare_tools()
    depth = np.full((48, 64), 2.0, np.float32)
    n = pd.normals_from_depth(depth)
    inner = n[4:-4, 4:-4]
    # constant-depth plane faces the camera: (0, 0, -1)
    np.testing.assert_allclose(inner[..., 0], 0.0, atol=1e-4)
    np.testing.assert_allclose(inner[..., 1], 0.0, atol=1e-4)
    np.testing.assert_allclose(inner[..., 2], -1.0, atol=1e-4)


def test_normals_from_depth_floor_plane():
    pd = _prepare_tools()
    # floor at constant camera-space height Y0: z = Y0 * fy / (v - cy),
    # valid only below the principal point (v > cy)
    h, w = 480, 64
    v = np.arange(h, dtype=np.float32)[:, None]
    z = np.where(
        v > pd._NYU_CY + 20.0,
        1.5 * pd._NYU_FY / np.maximum(v - pd._NYU_CY, 1.0),
        0.0,
    ) * np.ones((h, w), np.float32)
    n = pd.normals_from_depth(z.astype(np.float32), smooth=0)
    inner = n[300:460, 8:-8]
    # floor normal points up (-y in y-down camera coords)
    assert np.all(inner[..., 1] < -0.99)
    assert np.all(np.abs(inner[..., 0]) < 1e-3)


def test_normals_from_depth_invalid_pixels():
    pd = _prepare_tools()
    depth = np.full((32, 32), 2.0, np.float32)
    depth[10:14, 10:14] = 0.0  # hole
    n = pd.normals_from_depth(depth, smooth=0)
    # hole and its difference neighbors are zero vectors
    assert np.all(n[11, 11] == 0.0)
    assert np.all(n[0, :] == 0.0)  # border invalidated
    # far-away valid pixels are unit length
    assert abs(np.linalg.norm(n[20, 20]) - 1.0) < 1e-4


def test_prepared_normal_roundtrip_and_mask(tmp_path):
    import os

    from PIL import Image

    from emsanet_tpu.datasets.disk import PreparedDataset
    from emsanet_tpu.preprocessing.transforms import get_preprocessor

    pd = _prepare_tools()
    split_dir = tmp_path / "train"
    h, w = 32, 48
    depth = np.full((h, w), 2.0, np.float32)
    depth[:4] = 0.0  # invalid strip
    normals = pd.normals_from_depth(depth, smooth=0)
    for sub in ("rgb", "depth", "normal"):
        os.makedirs(split_dir / sub, exist_ok=True)
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(
        split_dir / "rgb" / "0000.png"
    )
    Image.fromarray((depth * 1000).astype(np.uint16)).save(
        split_dir / "depth" / "0000.png"
    )
    Image.fromarray(pd.encode_normals_png(normals)).save(
        split_dir / "normal" / "0000.png"
    )

    ds = PreparedDataset(
        dataset_path=str(tmp_path), dataset_name="nyuv2", split="train",
        sample_keys=("identifier", "rgb", "depth", "normal"),
    )
    sample = ds[0]
    assert sample["normal"].shape == (h, w, 3)
    # decoded normals match the encode/decode roundtrip (u8 quantization)
    np.testing.assert_allclose(
        sample["normal"][16, 16], normals[16, 16], atol=2 / 255.0
    )

    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("normal",), input_height=h, input_width=w,
        ),
        data=DataConfig(dataset="nyuv2", aug_scale_min=1.0,
                        aug_scale_max=1.0),
    ).validate()
    pre = get_preprocessor(cfg, ds.config, phase="train")
    out = pre(dict(sample, _rng=np.random.default_rng(0)))
    assert "normal_mask" in out
    assert out["normal_mask"].dtype == bool
    # invalid strip masked out, interior valid (modulo flip augmentation)
    assert out["normal_mask"][16:-2, 8:-8].all()
    assert not out["normal_mask"][:2].any()
