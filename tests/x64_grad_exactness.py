"""f64 gradient-exactness oracle for the train-mode pair kernels.

Run in a SUBPROCESS (jax_enable_x64 is process-global config): compares
chain_train grads against the flax NBt1D path in float64, where
accumulation-order noise vanishes — any real formula error would show
up at O(1), the expected output is ~1e-13. Invoked by
tests/test_nbt1d_train.py::test_chain_train_grads_exact_f64.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import flax.linen as nn
import jax.numpy as jnp
import jax.tree_util as jtu
import numpy as np

from emsanet_tpu.models.layers import NonBottleneck1D
from emsanet_tpu.ops.nbt1d_train import (
    chain_train,
    stack_chain_train_params,
)


def model_level():
    """Whole-EMSANet fused_training equivalence in f64."""
    from emsanet_tpu.config import DataConfig, EMSANetConfig, ModelConfig
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model
    from emsanet_tpu.ops import nbt1d_train
    from emsanet_tpu.ops.nbt1d_train import merge_fused_bn_updates

    # the profitability gate would skip fusion at these tiny CPU shapes
    nbt1d_train.MIN_PIXELS = 0

    common = dict(
        tasks=("semantic",),
        input_height=96, input_width=128,
        rgb_encoder_backbone="resnet18", depth_encoder_backbone="resnet18",
        dropout_p=0.0, semantic_decoder_block_dropout_p=0.0,
        compute_dtype="float64",
    )
    ds_config = get_dataset_config(DataConfig(dataset="synthetic"))
    models = {}
    for fused in (False, True):
        cfg = EMSANetConfig(model=ModelConfig(
            fused_training=fused, **common)).validate()
        models[fused] = EMSANet(cfg=cfg.model, dataset_config=ds_config)
    variables = init_model(models[False], jax.random.PRNGKey(0), train=True)
    variables = jax.tree.map(
        lambda a: a.astype(jnp.float64)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        jax.device_get(variables),
    )

    rng = np.random.RandomState(0)
    batch = {
        "rgb": jnp.asarray(rng.randn(2, 96, 128, 3), jnp.float64),
        "depth": jnp.asarray(rng.randn(2, 96, 128, 1), jnp.float64),
    }
    # train-step head contract: the fused model defers the final x2
    # stage (decode_input) and the loss comes from
    # fused_semantic_head_loss (jnp reference path in f64/CPU); the
    # unfused model exposes full-res logits -> cross_entropy_semantic
    from emsanet_tpu.losses import cross_entropy_semantic
    from emsanet_tpu.ops.semantic_train_head import fused_semantic_head_loss

    n_cls = ds_config.n_semantic_classes_without_void
    target = jnp.asarray(
        rng.randint(0, n_cls + 1, size=(2, 96, 128)), jnp.int32
    )
    grads = {}
    for fused in (False, True):
        def loss(params):
            out, mut = models[fused].apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                batch, train=True,
                mutable=["batch_stats", "fused_bn"],
                rngs={"dropout": jax.random.PRNGKey(1)},
            )
            sem = out["semantic"]
            if "decode_input" in sem:
                di = sem["decode_input"]
                return fused_semantic_head_loss(
                    di["x"], di["kernel"], target
                )
            return cross_entropy_semantic(sem["logits"], target)

        grads[fused] = jax.grad(loss)(variables["params"])

    for (kp, a), (_, b) in zip(
        jtu.tree_flatten_with_path(grads[True])[0],
        jtu.tree_flatten_with_path(grads[False])[0],
    ):
        d = float(jnp.max(jnp.abs(a - b)))
        rel = d / (float(jnp.max(jnp.abs(b))) + 1e-30)
        assert rel < 1e-9 or d < 1e-8, (
            f"{jtu.keystr(kp)} diff {d} rel {rel}"
        )
    print("F64_MODEL_OK")


def main():
    k, n, h, w, c = 2, 2, 16, 16, 8
    rng = np.random.RandomState(0)

    class Chain(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            for i in range(k):
                x = NonBottleneck1D(
                    features=c, name=f"block{i}", dtype=jnp.float64
                )(x, train=train, deterministic=True)
            return x

    model = Chain()
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.float64)
    variables = jax.device_get(model.init(jax.random.PRNGKey(0), x))
    leaves, treedef = jtu.tree_flatten(variables["params"])
    leaves = [
        jnp.asarray(
            rng.randn(*a.shape) * 0.2 + (0.5 if a.ndim == 1 else 0),
            jnp.float64,
        )
        for a in leaves
    ]
    params = jtu.tree_unflatten(treedef, leaves)
    bs = jax.tree.map(
        lambda a: a.astype(jnp.float64), variables["batch_stats"]
    )
    cot = jnp.asarray(rng.randn(n, h, w, c), jnp.float64)

    def loss_ref(params, x):
        out, _ = model.apply(
            {"params": params, "batch_stats": bs}, x,
            train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out * cot)

    def loss_ker(params, x):
        bp = [params[f"block{i}"] for i in range(k)]
        out, _, _ = chain_train(
            x, stack_chain_train_params(bp), interpret=True
        )
        return jnp.sum(out * cot)

    gr = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    gk = jax.grad(loss_ker, argnums=(0, 1))(params, x)

    dx = float(jnp.max(jnp.abs(gk[1] - gr[1])))
    assert dx < 1e-10, f"grad_x diff {dx}"
    for (kp, a), (_, b) in zip(
        jtu.tree_flatten_with_path(gk[0])[0],
        jtu.tree_flatten_with_path(gr[0])[0],
    ):
        d = float(jnp.max(jnp.abs(a - b)))
        # absolute: grads are O(10); conv-before-BN bias grads are
        # exactly 0 up to float noise (mean subtraction)
        assert d < 1e-10, f"{jtu.keystr(kp)} diff {d}"
    print("F64_EXACTNESS_OK")


if __name__ == "__main__":
    import sys

    if "--model" in sys.argv:
        model_level()
    else:
        main()
