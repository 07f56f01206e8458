"""Numeric parity of core blocks vs hand-built torch equivalents.

Locks the block structure (conv order, strides, norm placement,
activations) against an independent torch implementation so that a
converted PyTorch checkpoint reproduces outputs (the released-weights
parity goal, SURVEY.md §7 'hard parts').
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from emsanet_tpu.models.layers import NonBottleneck1D
from emsanet_tpu.models.upsampling import Upsampling
from emsanet_tpu.weights import convert_torch_tensor


def test_nonbottleneck1d_matches_torch():
    import torch
    import torch.nn as tnn

    c = 8
    torch.manual_seed(0)

    class TorchNBt1D(tnn.Module):
        """ERFNet NBt1D: 3x1,ReLU,1x3,BN+ReLU,3x1,ReLU,1x3,BN,+res,ReLU."""

        def __init__(self):
            super().__init__()
            self.c31_1 = tnn.Conv2d(c, c, (3, 1), padding=(1, 0))
            self.c13_1 = tnn.Conv2d(c, c, (1, 3), padding=(0, 1))
            self.bn1 = tnn.BatchNorm2d(c, eps=1e-5)
            self.c31_2 = tnn.Conv2d(c, c, (3, 1), padding=(1, 0))
            self.c13_2 = tnn.Conv2d(c, c, (1, 3), padding=(0, 1))
            self.bn2 = tnn.BatchNorm2d(c, eps=1e-5)

        def forward(self, x):
            h = torch.relu(self.c31_1(x))
            h = torch.relu(self.bn1(self.c13_1(h)))
            h = torch.relu(self.c31_2(h))
            h = self.bn2(self.c13_2(h))
            return torch.relu(h + x)

    tmod = TorchNBt1D().eval()
    # randomize BN stats so the test is not trivially identity
    with torch.no_grad():
        tmod.bn1.running_mean.uniform_(-0.5, 0.5)
        tmod.bn1.running_var.uniform_(0.5, 1.5)
        tmod.bn2.running_mean.uniform_(-0.5, 0.5)
        tmod.bn2.running_var.uniform_(0.5, 1.5)

    jmod = NonBottleneck1D(features=c, dropout_p=0.0)
    x_t = torch.randn(2, c, 10, 12)
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    variables = jmod.init(jax.random.PRNGKey(0), x_j)

    # copy torch weights into the flax param tree
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    sd = tmod.state_dict()
    params["Conv_0"]["kernel"] = convert_torch_tensor("", sd["c31_1.weight"])
    params["Conv_0"]["bias"] = sd["c31_1.bias"].numpy()
    params["Conv_1"]["kernel"] = convert_torch_tensor("", sd["c13_1.weight"])
    params["Conv_1"]["bias"] = sd["c13_1.bias"].numpy()
    params["Conv_2"]["kernel"] = convert_torch_tensor("", sd["c31_2.weight"])
    params["Conv_2"]["bias"] = sd["c31_2.bias"].numpy()
    params["Conv_3"]["kernel"] = convert_torch_tensor("", sd["c13_2.weight"])
    params["Conv_3"]["bias"] = sd["c13_2.bias"].numpy()
    params["Norm_0"]["BatchNorm_0"]["scale"] = sd["bn1.weight"].numpy()
    params["Norm_0"]["BatchNorm_0"]["bias"] = sd["bn1.bias"].numpy()
    stats["Norm_0"]["BatchNorm_0"]["mean"] = sd["bn1.running_mean"].numpy()
    stats["Norm_0"]["BatchNorm_0"]["var"] = sd["bn1.running_var"].numpy()
    params["Norm_1"]["BatchNorm_0"]["scale"] = sd["bn2.weight"].numpy()
    params["Norm_1"]["BatchNorm_0"]["bias"] = sd["bn2.bias"].numpy()
    stats["Norm_1"]["BatchNorm_0"]["mean"] = sd["bn2.running_mean"].numpy()
    stats["Norm_1"]["BatchNorm_0"]["var"] = sd["bn2.running_var"].numpy()

    with torch.no_grad():
        want = tmod(x_t).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(
        jmod.apply({"params": params, "batch_stats": stats}, x_j, train=False)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_learned3x3_upsampling_matches_torch():
    import torch
    import torch.nn.functional as F

    c = 4
    torch.manual_seed(1)
    x_t = torch.randn(1, c, 6, 7)
    w_t = torch.randn(c, 1, 3, 3)

    # torch: nearest x2 + depthwise 3x3 zero-padded
    up = F.interpolate(x_t, scale_factor=2, mode="nearest")
    want = F.conv2d(up, w_t, padding=1, groups=c).numpy().transpose(0, 2, 3, 1)

    jmod = Upsampling("learned-3x3-zeropad")
    x_j = jnp.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    variables = jmod.init(jax.random.PRNGKey(0), x_j)
    params = jax.tree.map(np.asarray, variables["params"])
    # torch depthwise (C,1,3,3) -> flax (3,3,1,C)
    params["depthwise"]["kernel"] = w_t.numpy().transpose(2, 3, 1, 0)
    got = np.asarray(jmod.apply({"params": params}, x_j))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_learned3x3_default_init_mimics_bilinear():
    """Default depthwise init approximates bilinear x2 on smooth inputs."""
    x = jnp.asarray(
        np.linspace(0, 1, 8 * 8, dtype=np.float32).reshape(1, 8, 8, 1)
    )
    jmod = Upsampling("learned-3x3-zeropad")
    variables = jmod.init(jax.random.PRNGKey(0), x)
    up = np.asarray(jmod.apply(variables, x))
    bil = np.asarray(
        jax.image.resize(x, (1, 16, 16, 1), method="bilinear")
    )
    # interior agreement (borders differ by padding choice)
    np.testing.assert_allclose(
        up[0, 2:-2, 2:-2, 0], bil[0, 2:-2, 2:-2, 0], atol=0.05
    )


# ---------------------------------------------------------------------------
# Whole-model conversion parity (VERDICT r1 next-steps #2)


def _flagship_flax(stage_blocks):
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet

    backbone = "resnet18" if stage_blocks == (2, 2, 2, 2) else "resnet34"
    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance", "orientation", "scene"),
            enable_panoptic=True,
            input_height=96,
            input_width=128,
            rgb_encoder_backbone=backbone,
            depth_encoder_backbone=backbone,
        ),
        data=DataConfig(dataset="synthetic"),
    ).validate()
    ds = get_dataset_config(cfg.data)
    return EMSANet(cfg=cfg.model, dataset_config=ds), cfg, ds


def test_name_map_covers_every_leaf():
    """The full-model torch->flax name map covers 100% of flax leaves and
    100% of the torch mirror's state_dict keys (both directions)."""
    import torch

    from emsanet_tpu.torch_compat.mirror import TorchEMSANet
    from emsanet_tpu.torch_compat.name_map import emsanet_torch_name_map
    from emsanet_tpu.weights import _flatten

    stage_blocks = (2, 2, 2, 2)
    tmod = TorchEMSANet(stage_blocks=stage_blocks)
    name_map = emsanet_torch_name_map(stage_blocks=stage_blocks)

    torch_keys = {
        k for k in tmod.state_dict()
        if not k.endswith("num_batches_tracked")
    }
    assert torch_keys == set(name_map), (
        sorted(torch_keys - set(name_map))[:5],
        sorted(set(name_map) - torch_keys)[:5],
    )

    model, _, _ = _flagship_flax(stage_blocks)
    # train=True so side-output convs are created
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        {"rgb": jnp.zeros((1, 96, 128, 3)),
         "depth": jnp.zeros((1, 96, 128, 1))},
        train=True,
    )
    flax_params = set(_flatten(variables["params"]))
    flax_stats = set(_flatten(variables["batch_stats"]))
    mapped_params = {p for p in name_map.values()
                     if p[-1] not in ("mean", "var")}
    mapped_stats = {p[:-1] + (p[-1],) for p in name_map.values()
                    if p[-1] in ("mean", "var")}
    assert mapped_params == flax_params, (
        sorted(mapped_params - flax_params)[:5],
        sorted(flax_params - mapped_params)[:5],
    )
    assert mapped_stats == flax_stats, (
        sorted(mapped_stats - flax_stats)[:5],
        sorted(flax_stats - mapped_stats)[:5],
    )


def test_whole_model_torch_parity():
    """Random torch weights -> converter -> flax forward matches the torch
    forward on every task output (<=1e-4, reference emsanet/model.py)."""
    import torch

    from emsanet_tpu.torch_compat.mirror import (
        TorchEMSANet,
        randomize_batchnorm_stats,
    )
    from emsanet_tpu.weights import _flatten, _unflatten
    from tools.import_torch_checkpoint import convert_state_dict

    stage_blocks = (2, 2, 2, 2)
    torch.manual_seed(0)
    tmod = TorchEMSANet(stage_blocks=stage_blocks).eval()
    randomize_batchnorm_stats(tmod)

    params, stats, unmatched = convert_state_dict(
        tmod.state_dict(), stage_blocks=stage_blocks, verbose=False
    )
    assert not unmatched

    model, _, _ = _flagship_flax(stage_blocks)
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        {"rgb": jnp.zeros((1, 96, 128, 3)),
         "depth": jnp.zeros((1, 96, 128, 1))},
        train=True,
    )
    flat_p = _flatten(variables["params"])
    flat_s = _flatten(variables["batch_stats"])
    assert set(params) == set(flat_p)
    for k, v in params.items():
        assert v.shape == np.asarray(flat_p[k]).shape, (k, v.shape)
    variables = {
        "params": _unflatten({k: v.astype(np.float32)
                              for k, v in params.items()}),
        "batch_stats": _unflatten({k: v.astype(np.float32)
                                   for k, v in stats.items()}),
    }

    torch.manual_seed(1)
    rgb_t = torch.randn(2, 3, 96, 128)
    depth_t = torch.randn(2, 1, 96, 128)
    with torch.no_grad():
        want = tmod(rgb_t, depth_t)

    batch = {
        "rgb": jnp.asarray(rgb_t.numpy().transpose(0, 2, 3, 1)),
        "depth": jnp.asarray(depth_t.numpy().transpose(0, 2, 3, 1)),
    }
    got = model.apply(variables, batch, train=False)

    def chk(torch_out, jax_out, name):
        np.testing.assert_allclose(
            np.asarray(jax_out),
            torch_out.numpy().transpose(0, 2, 3, 1)
            if torch_out.ndim == 4 else torch_out.numpy(),
            atol=1e-4, rtol=1e-3, err_msg=name,
        )

    chk(want["semantic_logits"], got["semantic"]["logits"], "semantic")
    chk(want["instance_center"], got["instance"]["center"], "center")
    chk(want["instance_offset"], got["instance"]["offset"], "offset")
    chk(want["instance_orientation"], got["instance"]["orientation"],
        "orientation")
    chk(want["scene_logits"], got["scene"]["logits"], "scene")


def _convert_and_check(tmod, model, stage_blocks, h, w):
    """Convert the mirror's weights and return matched flax variables."""
    from emsanet_tpu.weights import _flatten, _unflatten
    from tools.import_torch_checkpoint import convert_state_dict

    params, stats, unmatched = convert_state_dict(
        tmod.state_dict(), stage_blocks=stage_blocks, verbose=False
    )
    assert not unmatched
    variables = model.init(
        {"params": jax.random.PRNGKey(0),
         "dropout": jax.random.PRNGKey(1)},
        {"rgb": jnp.zeros((1, h, w, 3)),
         "depth": jnp.zeros((1, h, w, 1))},
        train=True,
    )
    flat_p = _flatten(variables["params"])
    assert set(params) == set(flat_p)
    return {
        "params": _unflatten({k: v.astype(np.float32)
                              for k, v in params.items()}),
        "batch_stats": _unflatten({k: v.astype(np.float32)
                                   for k, v in stats.items()}),
    }


@pytest.mark.slow
def test_whole_model_torch_parity_fullres_r34():
    """Flagship-shape parity: R34 (3,4,6,3) at 480x640 f32 b1 (VERDICT r2
    next-steps #4). Locks the resolution/depth-dependent numerics the
    96x128 test cannot see: PPM adaptive pooling at 15x20 context size
    (reference args.py:970), learned-3x3 boundary behavior through five
    x2 stages to 480x640, R34 stage indexing, 40-class heads."""
    import torch

    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet
    from emsanet_tpu.torch_compat.mirror import (
        TorchEMSANet,
        randomize_batchnorm_stats,
    )

    stage_blocks = (3, 4, 6, 3)
    h, w = 480, 640
    torch.manual_seed(0)
    tmod = TorchEMSANet(stage_blocks=stage_blocks).eval()
    randomize_batchnorm_stats(tmod)

    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance", "orientation", "scene"),
            enable_panoptic=True,
            input_height=h, input_width=w,
        ),
        data=DataConfig(dataset="synthetic"),
    ).validate()
    model = EMSANet(cfg=cfg.model,
                    dataset_config=get_dataset_config(cfg.data))
    variables = _convert_and_check(tmod, model, stage_blocks, h, w)

    torch.manual_seed(1)
    rgb_t = torch.randn(1, 3, h, w)
    depth_t = torch.randn(1, 1, h, w)
    with torch.no_grad():
        want = tmod(rgb_t, depth_t)
    batch = {
        "rgb": jnp.asarray(rgb_t.numpy().transpose(0, 2, 3, 1)),
        "depth": jnp.asarray(depth_t.numpy().transpose(0, 2, 3, 1)),
    }
    got = jax.jit(
        lambda v, b: model.apply(v, b, train=False)
    )(variables, batch)

    def chk(torch_out, jax_out, name):
        np.testing.assert_allclose(
            np.asarray(jax_out),
            torch_out.numpy().transpose(0, 2, 3, 1)
            if torch_out.ndim == 4 else torch_out.numpy(),
            atol=1e-4, rtol=1e-3, err_msg=name,
        )

    chk(want["semantic_logits"], got["semantic"]["logits"], "semantic")
    chk(want["instance_center"], got["instance"]["center"], "center")
    chk(want["instance_offset"], got["instance"]["offset"], "offset")
    chk(want["instance_orientation"], got["instance"]["orientation"],
        "orientation")
    chk(want["scene_logits"], got["scene"]["logits"], "scene")


@pytest.mark.slow
def test_metric_pipeline_parity():
    """Converted weights through postprocessing + PQ/mIoU/MAAE on both
    frameworks: torch-mirror outputs and flax outputs fed through the
    SAME metric pipeline must produce (near-)identical metric values
    (VERDICT r2 next-steps #4, metric-pipeline parity)."""
    import torch

    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet
    from emsanet_tpu.postprocessing import postprocess
    from emsanet_tpu.task_helper import get_task_helpers
    from emsanet_tpu.torch_compat.mirror import (
        TorchEMSANet,
        randomize_batchnorm_stats,
    )

    stage_blocks = (2, 2, 2, 2)
    h, w = 96, 128
    torch.manual_seed(0)
    tmod = TorchEMSANet(stage_blocks=stage_blocks).eval()
    randomize_batchnorm_stats(tmod)

    cfg = EMSANetConfig(
        model=ModelConfig(
            tasks=("semantic", "instance", "orientation", "scene"),
            enable_panoptic=True,
            input_height=h, input_width=w,
            rgb_encoder_backbone="resnet18",
            depth_encoder_backbone="resnet18",
        ),
        data=DataConfig(dataset="synthetic"),
    ).validate()
    ds_config = get_dataset_config(cfg.data)
    model = EMSANet(cfg=cfg.model, dataset_config=ds_config)
    variables = _convert_and_check(tmod, model, stage_blocks, h, w)

    torch.manual_seed(1)
    rgb_t = torch.randn(2, 3, h, w)
    depth_t = torch.randn(2, 1, h, w)
    with torch.no_grad():
        want = tmod(rgb_t, depth_t)

    batch = {
        "rgb": jnp.asarray(rgb_t.numpy().transpose(0, 2, 3, 1)),
        "depth": jnp.asarray(depth_t.numpy().transpose(0, 2, 3, 1)),
    }
    got = model.apply(variables, batch, train=False)

    # identical raw-output *structure* from the torch side
    torch_outputs = {
        "semantic": {"logits": jnp.asarray(
            want["semantic_logits"].numpy().transpose(0, 2, 3, 1))},
        "instance": {
            "center": jnp.asarray(
                want["instance_center"].numpy().transpose(0, 2, 3, 1)),
            "offset": jnp.asarray(
                want["instance_offset"].numpy().transpose(0, 2, 3, 1)),
            "orientation": jnp.asarray(
                want["instance_orientation"].numpy().transpose(0, 2, 3, 1)),
        },
        "scene": {"logits": jnp.asarray(want["scene_logits"].numpy())},
    }

    is_thing = jnp.asarray(
        np.asarray(ds_config.semantic_label_list.classes_is_thing)
    )
    use_orients = jnp.asarray(
        np.asarray(ds_config.semantic_label_list.classes_use_orientations)
    )
    preds_t = jax.device_get(postprocess(
        torch_outputs, is_thing, cfg.model, use_orientations=use_orients
    ))
    preds_j = jax.device_get(postprocess(
        got, is_thing, cfg.model, use_orientations=use_orients
    ))

    # the discrete decisions must agree essentially everywhere
    sem_t = preds_t["semantic_segmentation_idx"]
    sem_j = preds_j["semantic_segmentation_idx"]
    assert (sem_t == sem_j).mean() > 0.999

    # synthetic GT + the full metric pipeline on both prediction sets
    rng = np.random.default_rng(0)
    gt_sem = rng.integers(0, 41, size=(2, h, w)).astype(np.int32)
    gt_inst = (rng.integers(0, 4, size=(2, h, w)) *
               (gt_sem > 20)).astype(np.int32)
    gt_batch = {
        "semantic": gt_sem,
        "instance": gt_inst,
        "scene": np.asarray([1, 2], np.int32),
        "orientations_present": [{1: 0.5}, {2: 1.0}],
    }

    def run_metrics(preds):
        helpers = get_task_helpers(cfg, ds_config)
        logs = {}
        for th in helpers:
            th.initialize()
            th.validation_step(gt_batch, preds)
            _, th_logs = th.validation_epoch_end()
            logs.update(th_logs)
        return logs

    logs_t = run_metrics(preds_t)
    logs_j = run_metrics(preds_j)
    assert set(logs_t) == set(logs_j)
    for key in logs_t:
        a, b = float(logs_t[key]), float(logs_j[key])
        if np.isnan(a) and np.isnan(b):
            continue
        assert abs(a - b) < 5e-3, (key, a, b)
