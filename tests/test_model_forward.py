"""Model interface tests: forward shapes per task/modality combination.

Analog of the reference's `tests/test_interface_model.py` (SURVEY.md §4):
synthetic batches of the exact batch contract; `jax.jit`-traceability of
the forward pass stands in for ONNX-exportability as the structural
invariant.
"""

import jax
import jax.numpy as jnp
import pytest

from emsanet_tpu.config import EMSANetConfig, ModelConfig
from emsanet_tpu.datasets.metadata import get_metadata_config
from emsanet_tpu.models import EMSANet, init_model


def _make_model(small_shape, **model_kwargs):
    h, w = small_shape
    # resnet18 encoders by default: same code paths, much faster CPU compiles
    model_kwargs.setdefault("rgb_encoder_backbone", "resnet18")
    model_kwargs.setdefault("depth_encoder_backbone", "resnet18")
    model_kwargs.setdefault("rgbd_encoder_backbone", "resnet18")
    cfg = EMSANetConfig(
        model=ModelConfig(input_height=h, input_width=w, **model_kwargs)
    ).validate()
    ds_config = get_metadata_config("nyuv2")
    model = EMSANet(cfg=cfg.model, dataset_config=ds_config)
    return cfg, model


def _make_batch(cfg, batch_size=2):
    h, w = cfg.model.input_height, cfg.model.input_width
    batch = {}
    mods = cfg.model.input_modalities
    if "rgb" in mods or "rgbd" in mods:
        batch["rgb"] = jnp.ones((batch_size, h, w, 3), jnp.float32)
    if "depth" in mods or "rgbd" in mods:
        batch["depth"] = jnp.ones((batch_size, h, w, 1), jnp.float32)
    return batch


@pytest.mark.parametrize(
    "tasks,panoptic",
    [
        (("semantic",), False),
        (("semantic", "scene"), False),
        (("semantic", "instance"), False),
        (("semantic", "instance", "orientation", "scene"), True),
    ],
)
def test_forward_tasks(rng, small_shape, tasks, panoptic):
    cfg, model = _make_model(small_shape, tasks=tasks, enable_panoptic=panoptic)
    variables = init_model(model, rng)
    batch = _make_batch(cfg)
    out = model.apply(variables, batch, train=False)

    h, w = small_shape
    if "semantic" in tasks:
        assert out["semantic"]["logits"].shape == (2, h, w, 40)
    if "instance" in tasks:
        assert out["instance"]["center"].shape == (2, h, w, 1)
        assert out["instance"]["offset"].shape == (2, h, w, 2)
        # sigmoid/tanh encodings (model.py:122-137)
        assert float(out["instance"]["center"].min()) >= 0.0
        assert float(out["instance"]["center"].max()) <= 1.0
        assert float(out["instance"]["offset"].min()) >= -1.0
        assert float(out["instance"]["offset"].max()) <= 1.0
    if "orientation" in tasks:
        assert out["instance"]["orientation"].shape == (2, h, w, 2)
    if "scene" in tasks:
        n_scene = len(get_metadata_config("nyuv2").scene_label_list) - 1
        assert out["scene"]["logits"].shape == (2, n_scene)


@pytest.mark.parametrize(
    "modalities", [("rgb",), ("depth",), ("rgb", "depth"), ("rgbd",)]
)
def test_forward_modalities(rng, small_shape, modalities):
    cfg, model = _make_model(small_shape, input_modalities=modalities)
    variables = init_model(model, rng)
    batch = _make_batch(cfg)
    out = model.apply(variables, batch, train=False)
    h, w = small_shape
    assert out["semantic"]["logits"].shape == (2, h, w, 40)


@pytest.mark.parametrize("backbone", ["resnet34se", "resnet50"])
def test_forward_backbones(rng, small_shape, backbone):
    cfg, model = _make_model(
        small_shape,
        rgb_encoder_backbone=backbone,
        depth_encoder_backbone=backbone,
    )
    variables = init_model(model, rng)
    out = model.apply(variables, _make_batch(cfg, 1), train=False)
    h, w = small_shape
    assert out["semantic"]["logits"].shape == (1, h, w, 40)


def test_forward_basicblock_and_swish(rng, small_shape):
    cfg, model = _make_model(
        small_shape,
        rgb_encoder_backbone_block="basicblock",
        depth_encoder_backbone_block="basicblock",
        activation="swish",
    )
    variables = init_model(model, rng)
    out = model.apply(variables, _make_batch(cfg, 1), train=False)
    assert jnp.isfinite(out["semantic"]["logits"]).all()


def test_forward_mlp_decoder(rng, small_shape):
    cfg, model = _make_model(
        small_shape,
        tasks=("semantic", "instance"),
        semantic_decoder="segformermlp",
        instance_decoder="segformermlp",
    )
    variables = init_model(model, rng)
    out = model.apply(variables, _make_batch(cfg, 1), train=False)
    h, w = small_shape
    assert out["semantic"]["logits"].shape == (1, h, w, 40)
    assert out["instance"]["center"].shape == (1, h, w, 1)
    # MLP decoders have no side outputs (args.py:1382-1398)
    assert out["semantic"]["side_outputs"] == ()


def test_side_outputs_train_mode(rng, small_shape):
    cfg, model = _make_model(small_shape, tasks=("semantic", "instance"))
    variables = init_model(model, rng, train=True)
    batch = _make_batch(cfg, 1)
    out, _ = model.apply(
        variables,
        batch,
        train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    h, w = small_shape
    sides = out["semantic"]["side_outputs"]
    assert len(sides) == 3
    # side outputs taken before each x2 upsample: 1/32, 1/16, 1/8
    assert sides[0].shape == (1, h // 32, w // 32, 40)
    assert sides[1].shape == (1, h // 16, w // 16, 40)
    assert sides[2].shape == (1, h // 8, w // 8, 40)
    inst_sides = out["instance"]["side_outputs"]
    assert inst_sides[0].shape == (1, h // 32, w // 32, 3)


def test_forward_jit_traceable(rng, small_shape):
    """jit-traceability = the rebuild's analog of ONNX exportability."""
    cfg, model = _make_model(
        small_shape,
        tasks=("semantic", "instance", "orientation", "scene"),
        enable_panoptic=True,
    )
    variables = init_model(model, rng)
    batch = _make_batch(cfg, 1)

    @jax.jit
    def fwd(variables, batch):
        return model.apply(variables, batch, train=False)

    out = fwd(variables, batch)
    assert jnp.isfinite(out["semantic"]["logits"]).all()


def test_reduced_skip_connections(rng, small_shape):
    """Reduced-skip variant (tests/test_interface_model.py:165-183 analog)."""
    cfg, model = _make_model(
        small_shape, encoder_decoder_skip_downsamplings=(4, 8)
    )
    variables = init_model(model, rng)
    out = model.apply(variables, _make_batch(cfg, 1), train=False)
    h, w = small_shape
    assert out["semantic"]["logits"].shape == (1, h, w, 40)


def test_stem_space_to_depth_exact():
    """The space-to-depth stem (strided 7x7 -> packed 4x4, pure kernel
    reshape) matches the plain stem on the same params up to conv
    accumulation order (models/backbone.py::ResNetStem)."""
    import numpy as np

    from emsanet_tpu.models.backbone import ResNetStem

    rng = np.random.RandomState(0)
    for c, dt, tol in ((3, jnp.float32, 1e-5), (1, jnp.float32, 1e-5),
                       (3, jnp.bfloat16, 0.05)):
        x = jnp.asarray(rng.randn(2, 64, 96, c), jnp.float32)
        # n=2 <= the latency gate, so the packed path engages for c=3 too
        a = ResNetStem(space_to_depth=True, dtype=dt)
        b = ResNetStem(space_to_depth=False, dtype=dt)
        v = a.init(jax.random.PRNGKey(0), x)
        v = jax.tree.map(
            lambda l: jnp.asarray(rng.randn(*l.shape) * 0.1, l.dtype)
            if l.ndim == 4 else l, v)
        ya = np.asarray(a.apply(v, x), np.float32)
        yb = np.asarray(b.apply(v, x), np.float32)
        np.testing.assert_allclose(ya, yb, rtol=tol, atol=tol)
