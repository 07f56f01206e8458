"""Diagnose the overfit-convergence gap (VERDICT r4 #1).

Evaluates an overfit run's checkpoint on its own train subset three ways:

  A. stored running BN stats  (exactly what `main.py` validation does)
  B. the eval batch's OWN batch statistics (reproduces the train-mode
     forward the loss saw, dropout off) — extracted from a train-mode
     mutable pass via the momentum update:  own = (new - m*old)/(1-m)
  C. recalibrated population stats over the whole subset (exact pooled
     mean; pooled var = E[var_i + mean_i^2] - pop_mean^2)

If B is near-perfect while A is not, the accuracy gap is BN running-stat
mismatch, not a target/loss/postprocessing bug. If C fixes A, the stored
running stats themselves are wrong (suspect: the fused-training
`fused_bn` merge, ops/nbt1d_train.py::merge_fused_bn_updates). If B is
also imperfect, the remaining gap is a real logic bug — the per-sample
scene table and per-pass metrics localize it.

Usage: python tools/overfit_diag.py RUN_DIR [--ckpt NAME]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint filename (default: best semantic ckpt "
                         "with the highest epoch)")
    ap.add_argument("--passes", default="A,B,C",
                    help="comma-set of passes to run (A,B,C)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from emsanet_tpu.config import EMSANetConfig
    from emsanet_tpu.data import get_datahelper
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model
    from emsanet_tpu.ops.nbt1d_train import merge_fused_bn_updates
    from emsanet_tpu.preprocessing import get_preprocessor
    from emsanet_tpu.task_helper import get_task_helpers
    from emsanet_tpu.training import (
        create_train_state, get_optimizer, load_checkpoint, make_eval_step,
    )
    from emsanet_tpu.training.step import extract_device_batch

    with open(os.path.join(args.run_dir, "args.json")) as fh:
        cfg = EMSANetConfig.from_json(fh.read())

    ckpt = args.ckpt
    if ckpt is None:
        cands = sorted(
            f for f in os.listdir(os.path.join(args.run_dir, "checkpoints"))
            if f.startswith("ckpt_semantic_miou")
        )
        ckpt = cands[-1]
    ckpt_path = os.path.join(args.run_dir, "checkpoints", ckpt)
    print(f"[diag] checkpoint: {ckpt_path}")

    ds_config = get_dataset_config(cfg.data)
    data = get_datahelper(cfg)
    multiscale = cfg.model.side_output_downscales or None
    data.set_train_preprocessor(
        get_preprocessor(cfg, ds_config, "train",
                         multiscale_downscales=multiscale)
    )
    data.set_valid_preprocessor(get_preprocessor(cfg, ds_config, "test"))

    model = EMSANet(cfg=cfg.model, dataset_config=ds_config)
    rng = jax.random.PRNGKey(cfg.train.seed)
    variables = init_model(model, rng, train=True)
    state = create_train_state(model, variables, get_optimizer(cfg.train))
    state, epoch, _ = load_checkpoint(ckpt_path, state)
    print(f"[diag] loaded epoch {epoch}")

    # dropout-free model for the train-mode stat-extraction pass
    cfg_nodrop = EMSANetConfig.from_json(cfg.to_json())
    cfg_nodrop.model.dropout_p = 0.0
    model_nodrop = EMSANet(cfg=cfg_nodrop.model, dataset_config=ds_config)

    is_thing = jnp.asarray(ds_config.semantic_label_list.classes_is_thing)
    use_orientations = jnp.asarray(
        ds_config.semantic_label_list.classes_use_orientations
    )
    eval_step = jax.jit(
        make_eval_step(model, cfg, is_thing, use_orientations=use_orientations)
    )

    @jax.jit
    def batch_own_stats(params, batch_stats, x):
        _, mutated = model_nodrop.apply(
            {"params": params, "batch_stats": batch_stats}, x,
            train=True, mutable=["batch_stats", "fused_bn"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        new = merge_fused_bn_updates(
            mutated["batch_stats"], mutated.get("fused_bn"))
        m = 0.9  # models/layers.py momentum
        return jax.tree.map(lambda n, o: (n - m * o) / (1.0 - m),
                            new, dict(batch_stats))

    task_helpers = get_task_helpers(cfg, ds_config)

    def eval_pass(name, stats_for_batch):
        for th in task_helpers:
            th.initialize()
        scene_rows = []
        for camera, loader in data.valid_loaders.items():
            for bi, batch in enumerate(loader.batches(0)):
                db = extract_device_batch(batch)
                x = {k: db[k] for k in ("rgb", "depth", "instance_foreground")
                     if k in db}
                stats = stats_for_batch(x)
                preds = jax.device_get(
                    eval_step(state.params, stats, x))
                for th in task_helpers:
                    th.validation_step(batch, preds)
                sp = np.asarray(preds["scene_class_idx"]) + 1
                st = np.asarray(batch["scene"])
                for i in range(len(st)):
                    scene_rows.append((bi, i, int(sp[i]), int(st[i])))
        logs = {}
        for th in task_helpers:
            _, l = th.validation_epoch_end()
            logs.update(l)
        print(f"\n=== pass {name} ===")
        print(json.dumps({k: round(float(v), 4) for k, v in logs.items()},
                         indent=None))
        bad = [r for r in scene_rows if r[2] != r[3]]
        print(f"scene per-sample (batch,idx,pred,target) mismatches: {bad}"
              if bad else "scene per-sample: all correct")
        return logs

    passes = set(args.passes.split(","))
    if "A" in passes:
        eval_pass("A (running stats)", lambda x: state.batch_stats)

    own_cache = {}

    def own_stats(x):
        key = id(x)  # one batch at a time; fine
        if key not in own_cache:
            own_cache[key] = batch_own_stats(state.params, state.batch_stats, x)
        return own_cache[key]

    if "B" in passes:
        eval_pass("B (batch-own stats)", own_stats)

    if "C" in passes:
        # exact pooled stats over all batches (equal batch sizes)
        all_own = []
        for camera, loader in data.valid_loaders.items():
            for batch in loader.batches(0):
                db = extract_device_batch(batch)
                x = {k: db[k] for k in ("rgb", "depth", "instance_foreground")
                     if k in db}
                all_own.append(jax.device_get(
                    batch_own_stats(state.params, state.batch_stats, x)))

        def pool(path_leaves):
            return np.mean(np.stack(path_leaves), axis=0)

        import jax.tree_util as jtu
        flat = [jtu.tree_flatten_with_path(o) for o in all_own]
        paths = [p for p, _ in flat[0][0]]
        pooled_leaves = {}
        # pair mean/var leaves by parent path for the exact var correction
        leafmap = [dict(zip([str(p) for p, _ in f[0]],
                            [l for _, l in f[0]])) for f in flat]
        out = {}
        for p in paths:
            k = str(p)
            vals = [lm[k] for lm in leafmap]
            if k.endswith("['var']"):
                mk = k[: -len("['var']")] + "['mean']"
                means = [lm[mk] for lm in leafmap]
                pop_mean = np.mean(np.stack(means), 0)
                out[k] = (np.mean(np.stack([v + m * m
                                            for v, m in zip(vals, means)]), 0)
                          - pop_mean * pop_mean)
            else:
                out[k] = np.mean(np.stack(vals), 0)
        treedef = flat[0][1]
        pooled = jtu.tree_unflatten(treedef, [out[str(p)] for p in paths])
        eval_pass("C (pooled population stats)", lambda x: pooled)


if __name__ == "__main__":
    main()
