"""AOT model export: serialize the full inference program to StableHLO.

TPU-native replacement for the reference's deployment-export subsystem
(`torch.onnx.export` -> onnx2trt/TensorRT engines,
inference_time_whole_model.py:599-662 / SURVEY.md R14): `jax.export`
serializes the jitted forward (+ optional on-device postprocessing)
program — weights baked in — to a portable artifact that any matching
JAX/XLA runtime can deserialize and run without Python model code.

Usage:
  python tools/export_model.py --out model.stablehlo \
      --weights-filepath ckpt.msgpack --batch-size 1 \
      [--with-postprocessing] [--verify]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from emsanet_tpu.utils.cli import args_to_config, build_parser

    parser = build_parser()
    g = parser.add_argument_group("export")
    g.add_argument("--out", required=True, help="output artifact path")
    g.add_argument("--export-batch-size", type=int, default=1)
    g.add_argument("--with-postprocessing", action="store_true")
    g.add_argument("--verify", action="store_true",
                   help="deserialize and compare against the live model")
    ns = parser.parse_args(argv)
    cfg = args_to_config(ns)
    if ns.device == "cpu":
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model
    from emsanet_tpu.postprocessing import postprocess
    from emsanet_tpu.training import create_train_state, get_optimizer

    ds_config = get_dataset_config(cfg.data)
    model = EMSANet(cfg=cfg.model, dataset_config=ds_config)
    variables = init_model(model, jax.random.PRNGKey(cfg.train.seed))
    state = create_train_state(model, variables, get_optimizer(cfg.train))
    if cfg.train.weights_filepath:
        from emsanet_tpu.weights import load_weights_file

        state = load_weights_file(cfg.train.weights_filepath, state, cfg)

    is_thing = jnp.asarray(ds_config.semantic_label_list.classes_is_thing)
    params, batch_stats = state.params, state.batch_stats

    def forward(rgb, depth):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            {"rgb": rgb, "depth": depth}, train=False,
        )
        if ns.with_postprocessing:
            out = postprocess(out, is_thing, cfg.model)
        return out

    n = ns.export_batch_size
    h, w = cfg.model.input_height, cfg.model.input_width
    rgb_spec = jax.ShapeDtypeStruct((n, h, w, 3), jnp.float32)
    depth_spec = jax.ShapeDtypeStruct((n, h, w, 1), jnp.float32)

    exported = jexport.export(jax.jit(forward))(rgb_spec, depth_spec)
    blob = exported.serialize()
    with open(ns.out, "wb") as fh:
        fh.write(blob)
    print(f"exported {len(blob)/1e6:.1f} MB -> {ns.out} "
          f"(platforms={exported.platforms})")

    if ns.verify:
        rng = np.random.RandomState(0)
        rgb = jnp.asarray(rng.randn(n, h, w, 3), jnp.float32)
        depth = jnp.asarray(rng.randn(n, h, w, 1), jnp.float32)
        with open(ns.out, "rb") as fh:
            restored = jexport.deserialize(fh.read())
        got = restored.call(rgb, depth)
        want = forward(rgb, depth)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            ),
            got, want,
        )
        print("verify: deserialized program matches the live model")
    return 0


if __name__ == "__main__":
    sys.exit(main())
