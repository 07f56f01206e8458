"""AOT StableHLO export roundtrip (tools/export_model.py analog in-proc)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import export as jexport

from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
from emsanet_tpu.datasets.metadata import get_metadata_config
from emsanet_tpu.models import EMSANet, init_model
from emsanet_tpu.postprocessing import postprocess


@pytest.mark.slow
def test_export_serialize_roundtrip(tmp_path):
    h = w = 64
    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance"), enable_panoptic=True,
            input_height=h, input_width=w,
            rgb_encoder_backbone="resnet18",
            depth_encoder_backbone="resnet18",
        ),
        data=DataConfig(dataset="synthetic"),
    ).validate()
    ds_config = get_metadata_config("nyuv2")
    model = EMSANet(cfg=cfg.model, dataset_config=ds_config)
    variables = init_model(model, jax.random.PRNGKey(0))
    is_thing = jnp.asarray(ds_config.semantic_label_list.classes_is_thing)
    params, stats = variables["params"], variables["batch_stats"]

    def forward(rgb, depth):
        out = model.apply(
            {"params": params, "batch_stats": stats},
            {"rgb": rgb, "depth": depth}, train=False,
        )
        return postprocess(out, is_thing, cfg.model)

    specs = (jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32),
             jax.ShapeDtypeStruct((1, h, w, 1), jnp.float32))
    exported = jexport.export(jax.jit(forward))(*specs)
    blob = exported.serialize()
    path = tmp_path / "model.stablehlo"
    path.write_bytes(blob)

    restored = jexport.deserialize(path.read_bytes())
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.randn(1, h, w, 3), jnp.float32)
    depth = jnp.asarray(rng.randn(1, h, w, 1), jnp.float32)
    got = restored.call(rgb, depth)
    want = forward(rgb, depth)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        got, want,
    )
