"""Raw instance-head output probe for an overfit checkpoint.

instance_diag.py showed merged/missed instances with all predicted
center scores ~0.2 and nearest-center distances ~300 px — values that
make no sense for an 800-epoch single-batch overfit (targets peak at
1.0 at the GT centroid). This probe bypasses the fused eval path and
prints, per GT thing instance:

  - the GT centroid and the GT target heatmap value there (sanity: 1.0)
  - the predicted heatmap value at the centroid
  - the max predicted value within +-16 px of the centroid
  - the mean voted center (pixel + offset) over the GT mask
and per image the global top-10 NMS peaks (y, x, score).

Usage: python tools/heatmap_probe.py RUN_DIR [--ckpt NAME] [--image I]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--ckpt", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from emsanet_tpu.config import EMSANetConfig
    from emsanet_tpu.data import get_datahelper
    from emsanet_tpu.datasets.registry import get_dataset_config
    from emsanet_tpu.models import EMSANet, init_model
    from emsanet_tpu.preprocessing import get_preprocessor
    from emsanet_tpu.training import (
        create_train_state, get_optimizer, load_checkpoint,
    )
    from emsanet_tpu.training.step import extract_device_batch

    with open(os.path.join(args.run_dir, "args.json")) as fh:
        cfg = EMSANetConfig.from_json(fh.read())
    # plain (unfused) head path so outputs carry real center/offset maps
    cfg.model.fused_inference = False
    cfg.model.head_decode_fusion = "interleave"

    ckpt = args.ckpt
    if ckpt is None:
        cands = sorted(
            f for f in os.listdir(os.path.join(args.run_dir, "checkpoints"))
            if f.startswith("ckpt_semantic_miou")
        )
        ckpt = cands[-1]
    ckpt_path = os.path.join(args.run_dir, "checkpoints", ckpt)
    print(f"[probe] checkpoint: {ckpt_path}", flush=True)

    ds_config = get_dataset_config(cfg.data)
    data = get_datahelper(cfg)
    multiscale = cfg.model.side_output_downscales or None
    data.set_train_preprocessor(
        get_preprocessor(cfg, ds_config, "train",
                         multiscale_downscales=multiscale)
    )
    data.set_valid_preprocessor(get_preprocessor(cfg, ds_config, "test"))

    model = EMSANet(cfg=cfg.model, dataset_config=ds_config)
    variables = init_model(model, jax.random.PRNGKey(cfg.train.seed),
                           train=True)
    state = create_train_state(model, variables, get_optimizer(cfg.train))
    state, epoch, _ = load_checkpoint(ckpt_path, state)
    print(f"[probe] loaded epoch {epoch}", flush=True)

    is_thing = np.asarray(ds_config.semantic_label_list.classes_is_thing)

    @jax.jit
    def fwd(params, batch_stats, x):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        )
        return out["instance"]["center"], out["instance"]["offset"]

    loader = next(iter(data.valid_loaders.values()))
    batch = next(iter(loader.batches(0)))
    db = extract_device_batch(batch)
    x = {k: db[k] for k in ("rgb", "depth") if k in db}
    center, offset = jax.device_get(fwd(state.params, state.batch_stats, x))
    center = np.asarray(center)[..., 0].astype(np.float32)  # (N, H, W)
    offset = np.asarray(offset).astype(np.float32)          # (N, H, W, 2)
    n, h, w = center.shape
    print(f"[probe] center {center.shape} range "
          f"[{center.min():.4f}, {center.max():.4f}]  "
          f"offset range [{offset.min():.4f}, {offset.max():.4f}]",
          flush=True)

    gt_center = np.asarray(batch["instance_center"])[..., 0]
    gt_sem = np.asarray(batch["semantic"])
    gt_inst = np.asarray(batch["instance"])
    norm = np.asarray([h, w], np.float32)

    ys_g, xs_g = np.mgrid[0:h, 0:w].astype(np.float32)
    for i in range(n):
        # top-10 plain local maxima (17x17 max filter, threshold 0.05)
        hm = center[i]
        from scipy.ndimage import maximum_filter  # noqa: PLC0415

        keep = (hm >= maximum_filter(hm, size=17)) & (hm > 0.05)
        py, px = np.nonzero(keep)
        order = np.argsort(-hm[py, px])[:10]
        peaks = [(int(py[k]), int(px[k]), round(float(hm[py[k], px[k]]), 3))
                 for k in order]
        print(f"img {i}: top NMS peaks {peaks}", flush=True)

        thing = is_thing[gt_sem[i]] & (gt_inst[i] > 0)
        for iid in np.unique(gt_inst[i][thing]):
            mask = (gt_inst[i] == iid) & thing
            my, mx = ys_g[mask].mean(), xs_g[mask].mean()
            iy, ix = int(round(my)), int(round(mx))
            y0, y1 = max(iy - 16, 0), min(iy + 17, h)
            x0, x1 = max(ix - 16, 0), min(ix + 17, w)
            win = hm[y0:y1, x0:x1]
            wmax = float(win.max())
            wy, wx = np.unravel_index(np.argmax(win), win.shape)
            voted_y = (ys_g[mask] + offset[i][mask][:, 0] * norm[0]).mean()
            voted_x = (xs_g[mask] + offset[i][mask][:, 1] * norm[1]).mean()
            print(
                f"   iid={iid} area={int(mask.sum()):6d} "
                f"centroid=({my:6.1f},{mx:6.1f}) "
                f"gt_hm={gt_center[i, iy, ix]:.3f} "
                f"pred_hm@c={hm[iy, ix]:.3f} "
                f"max+-16={wmax:.3f}@({y0 + wy},{x0 + wx}) "
                f"voted=({voted_y:6.1f},{voted_x:6.1f})",
                flush=True,
            )


if __name__ == "__main__":
    main()
