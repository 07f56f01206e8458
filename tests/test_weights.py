"""Weight loading tests: transfer rules + torch ResNet conversion.

Analog of the reference's tests/test_model_weights.py + the surgery in
emsanet/weights.py (SURVEY.md R10): semantic-head class reconciliation,
scene-head mismatch skip, extra-key dropping, torch->flax backbone init.
"""

import numpy as np
import pytest

from emsanet_tpu.weights import (
    convert_torch_tensor,
    merge_loaded_params,
    resnet_torch_name_map,
)


def test_merge_semantic_head_37_to_40():
    loaded = {("semantic_decoder", "head_conv", "kernel"):
              np.ones((3, 3, 128, 37))}
    target = {("semantic_decoder", "head_conv", "kernel"):
              np.zeros((3, 3, 128, 40))}
    out = merge_loaded_params(loaded, target, verbose=False)
    k = out[("semantic_decoder", "head_conv", "kernel")]
    assert (k[..., :37] == 1).all()
    assert (k[..., 37:] == 0).all()  # random/zero init retained


def test_merge_semantic_head_40_to_37():
    loaded = {("semantic_decoder", "head_conv", "bias"): np.arange(40.0)}
    target = {("semantic_decoder", "head_conv", "bias"): np.zeros(37)}
    out = merge_loaded_params(loaded, target, verbose=False)
    np.testing.assert_array_equal(
        out[("semantic_decoder", "head_conv", "bias")], np.arange(37.0)
    )


def test_merge_scene_head_mismatch_skipped():
    loaded = {("scene_decoder", "head", "kernel"): np.ones((256, 20))}
    target = {("scene_decoder", "head", "kernel"): np.zeros((256, 10))}
    out = merge_loaded_params(loaded, target, verbose=False)
    assert (out[("scene_decoder", "head", "kernel")] == 0).all()


def test_merge_drops_extra_keys():
    loaded = {("normal_decoder", "x", "kernel"): np.ones(3)}
    target = {("semantic_decoder", "y", "kernel"): np.zeros(3)}
    out = merge_loaded_params(loaded, target, verbose=False)
    assert ("normal_decoder", "x", "kernel") not in out
    assert (out[("semantic_decoder", "y", "kernel")] == 0).all()


def test_merge_instance_head_orientation_strip():
    # pretrained with orientation (96ch shared conv) -> current without (64)
    loaded = {("instance_decoder", "head_shared_conv", "Conv_0", "kernel"):
              np.ones((3, 3, 128, 96))}
    target = {("instance_decoder", "head_shared_conv", "Conv_0", "kernel"):
              np.zeros((3, 3, 128, 64))}
    out = merge_loaded_params(loaded, target, verbose=False)
    assert out[
        ("instance_decoder", "head_shared_conv", "Conv_0", "kernel")
    ].shape == (3, 3, 128, 64)


def test_convert_torch_tensor_layouts():
    import torch

    conv = torch.randn(8, 4, 3, 3)  # OIHW
    out = convert_torch_tensor("w", conv)
    assert out.shape == (3, 3, 4, 8)  # HWIO
    np.testing.assert_allclose(out[1, 2, 3, 7], conv[7, 3, 1, 2].numpy())

    lin = torch.randn(10, 20)
    assert convert_torch_tensor("w", lin).shape == (20, 10)


def test_torch_resnet18_backbone_roundtrip(tmp_path):
    """A torch resnet18-style checkpoint initializes our basicblock
    backbone, including the depth-stem 3->1 channel adaptation."""
    import torch

    import jax
    from emsanet_tpu.config import EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.metadata import get_metadata_config
    from emsanet_tpu.models import EMSANet, init_model
    from emsanet_tpu.training import create_train_state, get_optimizer
    from emsanet_tpu.weights import load_backbone_pretrained

    # build a fake torchvision-style resnet18 state dict
    sd = {}
    sd["conv1.weight"] = torch.randn(64, 3, 7, 7)
    sd["bn1.weight"] = torch.rand(64)
    sd["bn1.bias"] = torch.randn(64)
    sd["bn1.running_mean"] = torch.randn(64)
    sd["bn1.running_var"] = torch.rand(64) + 0.5
    feats = [64, 128, 256, 512]
    for li, f in enumerate(feats):
        fin = 64 if li == 0 else feats[li - 1]
        for b in range(2):
            t = f"layer{li + 1}.{b}"
            cin = fin if b == 0 else f
            sd[f"{t}.conv1.weight"] = torch.randn(f, cin, 3, 3)
            sd[f"{t}.conv2.weight"] = torch.randn(f, f, 3, 3)
            for bni in (1, 2):
                sd[f"{t}.bn{bni}.weight"] = torch.rand(f)
                sd[f"{t}.bn{bni}.bias"] = torch.randn(f)
                sd[f"{t}.bn{bni}.running_mean"] = torch.randn(f)
                sd[f"{t}.bn{bni}.running_var"] = torch.rand(f) + 0.5
            if b == 0 and li > 0:
                sd[f"{t}.downsample.0.weight"] = torch.randn(f, fin, 1, 1)
                sd[f"{t}.downsample.1.weight"] = torch.rand(f)
                sd[f"{t}.downsample.1.bias"] = torch.randn(f)
                sd[f"{t}.downsample.1.running_mean"] = torch.randn(f)
                sd[f"{t}.downsample.1.running_var"] = torch.rand(f) + 0.5
    path = str(tmp_path / "resnet18.pth")
    torch.save(sd, path)

    cfg = EMSANetConfig(model=ModelConfig(
        input_height=64, input_width=64,
        rgb_encoder_backbone="resnet18",
        rgb_encoder_backbone_block="basicblock",
        depth_encoder_backbone="resnet18",
        depth_encoder_backbone_block="basicblock",
    )).validate()
    model = EMSANet(cfg=cfg.model,
                    dataset_config=get_metadata_config("nyuv2"))
    variables = init_model(model, jax.random.PRNGKey(0))
    state = create_train_state(model, variables, get_optimizer(cfg.train))

    state = load_backbone_pretrained(state, path, "rgb", "resnet18",
                                     verbose=False)
    state = load_backbone_pretrained(state, path, "depth", "resnet18",
                                     verbose=False)

    # rgb stem kernel matches the torch tensor (OIHW->HWIO)
    got = np.asarray(state.params["encoder"]["rgb_stem"]["Conv_0"]["kernel"])
    want = sd["conv1.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # depth stem: summed over input channels
    got_d = np.asarray(
        state.params["encoder"]["depth_stem"]["Conv_0"]["kernel"]
    )
    np.testing.assert_allclose(
        got_d, want.sum(axis=2, keepdims=True), rtol=1e-5
    )

    # batch stats transferred
    got_var = np.asarray(
        state.batch_stats["encoder"]["rgb_stage1"]["block0"]["Norm_1"][
            "BatchNorm_0"]["var"]
    )
    np.testing.assert_allclose(
        got_var, sd["layer2.0.downsample.1.running_var"].numpy(), rtol=1e-6
    )
