"""Inference timing harness: whole-model FPS across configurations.

Mirrors the reference `inference_time_whole_model.py` +
`inference_time.bash` (SURVEY.md R14/R15): 20 warmup + 80 timed runs,
mean/std FPS per configuration — but the entire ONNX-export ->
onnx2trt/TensorRT-engine -> pycuda-buffer subsystem is replaced by
AOT-compiled `jax.jit` (the TPU deployment path; SURVEY.md §2.4). The
`--sweep` mode reproduces the bash script's batch/precision sweep and
writes a CSV.

Usage:
    python inference_time.py                       # one config
    python inference_time.py --with-postprocessing
    python inference_time.py --sweep --csv out.csv
"""

from __future__ import annotations

import argparse
import csv
import sys


def _parse(argv=None):
    from emsanet_tpu.utils.cli import args_to_config, build_parser

    parser = build_parser()
    g = parser.add_argument_group("timing")
    g.add_argument("--time-batch-size", type=int, default=1)
    g.add_argument("--n-runs", type=int, default=80)
    g.add_argument("--n-runs-warmup", type=int, default=20)
    g.add_argument("--with-postprocessing", action="store_true")
    g.add_argument("--sweep", action="store_true",
                   help="sweep batch sizes x dtypes (inference_time.bash)")
    g.add_argument("--csv", default=None, help="write sweep results here")
    g.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the timed region "
                   "(view with tensorboard/xprof)")
    ns = parser.parse_args(argv)
    return args_to_config(ns), ns


def time_configuration(cfg, batch_size, dtype, with_postprocessing,
                       n_runs, n_warmup):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model
    from emsanet_tpu.postprocessing import postprocess
    from emsanet_tpu.utils.timing import queue_difference_timing, scalar_probe

    cfg.model.compute_dtype = dtype
    from emsanet_tpu.config import best_head_decode_fusion

    # fwd-only runs keep the head convs in the forward for protocol
    # comparability; otherwise the measured-best mode per batch applies
    cfg.model.head_decode_fusion = best_head_decode_fusion(
        batch_size, with_postprocessing
    )
    ds_config = get_dataset_config(cfg.data)
    model = EMSANet(cfg=cfg.model, dataset_config=ds_config)
    variables = init_model(model, jax.random.PRNGKey(0))
    is_thing = jnp.asarray(ds_config.semantic_label_list.classes_is_thing)

    h, w = cfg.model.input_height, cfg.model.input_width
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.randn(batch_size, h, w, 3), jnp.float32)
    depth = jnp.asarray(rng.randn(batch_size, h, w, 1), jnp.float32)
    params, batch_stats = variables["params"], variables["batch_stats"]

    @jax.jit
    def step(params, batch_stats, rgb, depth):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            {"rgb": rgb, "depth": depth}, train=False,
        )
        if with_postprocessing:
            out = postprocess(out, is_thing, cfg.model)
        return scalar_probe(out)

    sec, sec_std = queue_difference_timing(
        lambda: step(params, batch_stats, rgb, depth),
        n_long=n_runs, n_short=max(n_runs // 5, 2),
        warmup=max(n_warmup // 10, 1),
    )
    fps = batch_size / sec
    fps_std = fps * (sec_std / sec) if sec > 0 else 0.0
    return fps, fps_std, sec


def main(argv=None):
    cfg, ns = _parse(argv)
    if ns.device == "cpu":
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")

    import jax

    device = jax.devices()[0].device_kind
    configs = (
        [(b, d) for d in ("bfloat16", "float32") for b in (1, 8, 32)]
        if ns.sweep
        else [(ns.time_batch_size, cfg.model.compute_dtype)]
    )
    rows = []
    import contextlib

    profile_ctx = (
        jax.profiler.trace(ns.profile_dir)
        if ns.profile_dir else contextlib.nullcontext()
    )
    for batch_size, dtype in configs:
        with profile_ctx:
            fps, fps_std, sec = time_configuration(
                cfg, batch_size, dtype, ns.with_postprocessing,
                ns.n_runs, ns.n_runs_warmup,
            )
        profile_ctx = contextlib.nullcontext()  # profile first config only
        row = {
            "device": device,
            "batch_size": batch_size,
            "dtype": dtype,
            "postprocessing": ns.with_postprocessing,
            "fps_mean": round(fps, 2),
            "fps_std": round(fps_std, 2),
            "latency_ms": round(sec * 1e3, 3),
        }
        rows.append(row)
        print(f"batch={batch_size:3d} dtype={dtype:9s} "
              f"fps={fps:9.2f}±{fps_std:.2f} latency={sec*1e3:.2f}ms")

    if ns.csv:
        with open(ns.csv, "w", newline="") as fh:
            writer = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
            writer.writeheader()
            writer.writerows(rows)
        print(f"wrote {ns.csv}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
