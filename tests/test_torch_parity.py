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
