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
