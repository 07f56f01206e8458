"""Rematerialization: remat model must match non-remat numerics + grads."""

import jax
import jax.numpy as jnp
import numpy as np

from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
from emsanet_tpu.datasets.metadata import get_metadata_config
from emsanet_tpu.models import EMSANet, init_model


def test_remat_matches_no_remat():
    h, w = 64, 64
    common = dict(
        tasks=("semantic", "instance"),
        input_height=h, input_width=w,
        rgb_encoder_backbone="resnet18", depth_encoder_backbone="resnet18",
    )
    ds_config = get_metadata_config("nyuv2")
    cfg_a = EMSANetConfig(model=ModelConfig(remat=False, **common)).validate()
    cfg_b = EMSANetConfig(model=ModelConfig(remat=True, **common)).validate()
    model_a = EMSANet(cfg=cfg_a.model, dataset_config=ds_config)
    model_b = EMSANet(cfg=cfg_b.model, dataset_config=ds_config)

    variables = init_model(model_a, jax.random.PRNGKey(0), train=True)
    batch = {
        "rgb": jnp.asarray(np.random.RandomState(0).randn(1, h, w, 3),
                           jnp.float32),
        "depth": jnp.ones((1, h, w, 1), jnp.float32),
    }

    def loss(model, v):
        out, _ = model.apply(
            v, batch, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return jnp.mean(out["semantic"]["logits"] ** 2)

    la, ga = jax.value_and_grad(lambda p: loss(
        model_a, {"params": p, "batch_stats": variables["batch_stats"]}
    ))(variables["params"])
    lb, gb = jax.value_and_grad(lambda p: loss(
        model_b, {"params": p, "batch_stats": variables["batch_stats"]}
    ))(variables["params"])

    assert float(la) == float(lb)
    leaves_a, leaves_b = jax.tree.leaves(ga), jax.tree.leaves(gb)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
