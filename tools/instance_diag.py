"""Per-instance PQ failure diagnosis for an overfit run (VERDICT r4 #1).

Run #3 (single-batch overfit) saturated mIoU 0.979 / scene 1.0 / oriMAE
1.6 deg but things-PQ froze at 0.656 with RQ pinned at exactly 0.742 for
400 epochs — a fixed set of GT instances is structurally missed. This
tool evaluates a checkpoint on the overfit subset and, for every GT
thing segment, reports:

  - matched or not (panoptic-quality rule: same class, IoU > 0.5), IoU
  - segment area and class
  - the overlap decomposition of unmatched GT segments (which predicted
    segments absorbed them, with fractions) -> merged vs fragmented
  - the nearest valid predicted center to the GT instance centroid
    (distance in px + its score) -> center missed vs NMS-suppressed

Usage: python tools/instance_diag.py RUN_DIR [--ckpt NAME]
"""

import argparse
import json
import os
import sys
from collections import Counter

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
    from emsanet_tpu.metrics import (
        LABEL_DIVISOR, PanopticQuality, deeplab_merge_numpy,
    )
    from emsanet_tpu.models import EMSANet, init_model
    from emsanet_tpu.preprocessing import get_preprocessor
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
    print(f"[diag] checkpoint: {ckpt_path}", flush=True)

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
    print(f"[diag] loaded epoch {epoch}", flush=True)

    is_thing = np.asarray(ds_config.semantic_label_list.classes_is_thing)
    use_orientations = jnp.asarray(
        ds_config.semantic_label_list.classes_use_orientations
    )
    eval_step = jax.jit(
        make_eval_step(model, cfg, jnp.asarray(is_thing),
                       use_orientations=use_orientations)
    )
    pq = PanopticQuality(len(is_thing), is_thing.tolist())
    div = LABEL_DIVISOR

    kinds = Counter()
    for camera, loader in data.valid_loaders.items():
        for bi, batch in enumerate(loader.batches(0)):
            db = extract_device_batch(batch)
            x = {k: db[k] for k in ("rgb", "depth", "instance_foreground")
                 if k in db}
            preds = jax.device_get(
                eval_step(state.params, state.batch_stats, x))
            pred_pan = np.asarray(preds["panoptic_segmentation_deeplab"])
            gt_pan = deeplab_merge_numpy(
                np.asarray(batch["semantic"]), np.asarray(batch["instance"]),
                is_thing,
            )
            cyx = np.asarray(preds["instance_centers_yx"])
            cscore = np.asarray(preds["instance_centers_score"])
            cvalid = np.asarray(preds["instance_centers_valid"])
            inst_gtfg = np.asarray(
                preds.get("instance_segmentation_gt_foreground",
                          np.zeros(pred_pan.shape, np.int32)))

            for i in range(pred_pan.shape[0]):
                p = pred_pan[i].astype(np.int64)
                t = gt_pan[i].astype(np.int64)
                matches = pq.match_segments(p, t)
                matched_t = {m[0] for m in matches}
                matched_p = {m[1] for m in matches}
                iou_of = {m[0]: m[2] for m in matches}
                pred_of = {m[0]: m[1] for m in matches}

                t_ids, t_areas = np.unique(t, return_counts=True)
                rows = []
                for tid, area in zip(t_ids.tolist(), t_areas.tolist()):
                    cls = tid // div
                    if cls == 0 or not is_thing[cls]:
                        continue
                    mask = (t == tid)
                    ys, xs = np.nonzero(mask)
                    cen = (float(ys.mean()), float(xs.mean()))
                    d = np.hypot(cyx[i, :, 0] - cen[0], cyx[i, :, 1] - cen[1])
                    d = np.where(cvalid[i], d, np.inf)
                    j = int(np.argmin(d))
                    near = (float(d[j]), float(cscore[i, j]))
                    if tid in matched_t:
                        rows.append((tid, cls, area, "TP",
                                     round(iou_of[tid], 3), near))
                        kinds["TP"] += 1
                        continue
                    # overlap decomposition of this unmatched GT segment
                    pv, pc = np.unique(p[mask], return_counts=True)
                    order = np.argsort(-pc)
                    dec = []
                    for k in order[:3]:
                        pid = int(pv[k])
                        frac = pc[k] / area
                        tag = ("matched-elsewhere" if pid in matched_p
                               else ("stuff/void" if pid % div == 0
                                     else "unmatched-pred"))
                        dec.append((pid // div, pid % div,
                                    round(float(frac), 2), tag))
                    kind = ("MERGED" if dec and dec[0][3] == "matched-elsewhere"
                            else "MISSED")
                    kinds[kind] += 1
                    rows.append((tid, cls, area, kind, dec, near))
                n_pred_things = sum(
                    1 for pid in np.unique(p).tolist()
                    if pid // div != 0 and is_thing[pid // div]
                    and pid % div != 0
                )
                fails = [r for r in rows if r[3] != "TP"]
                gids, gareas = np.unique(inst_gtfg[i], return_counts=True)
                gseg = [(int(a), int(g)) for g, a in zip(gids, gareas)
                        if g != 0]
                print(f"img b{bi}.{i}: {len(rows)} GT things, "
                      f"{n_pred_things} pred things, "
                      f"{len(rows) - len(fails)} TP, "
                      f"{int(cvalid[i].sum())} valid centers, "
                      f"{len(gseg)} gt-fg segs "
                      f"(areas {sorted((a for a, _ in gseg), reverse=True)[:8]})",
                      flush=True)
                for r in sorted(rows, key=lambda r: r[2]):
                    tid, cls, area, kind = r[0], r[1], r[2], r[3]
                    extra = r[4]
                    near = r[5]
                    print(f"   gt id={tid} cls={cls} area={area:7d} "
                          f"{kind:7s} {extra} "
                          f"nearest-center d={near[0]:6.1f}px "
                          f"score={near[1]:.3f}", flush=True)
    print(json.dumps(dict(kinds)))


if __name__ == "__main__":
    main()
