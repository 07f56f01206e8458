"""PyTorch interop: full-model name map, torch mirror, checkpoint import.

The reference's released checkpoints are PyTorch state dicts whose key
structure is only partially visible in the reference checkout (the
`nicr_mt_scene_analysis` tier is an unvendored submodule). What *is*
locked here:

- `name_map.emsanet_torch_name_map`: a complete torch-key -> flax-path
  map for the flagship graph (every leaf covered, tested);
- `mirror.TorchEMSANet`: an independent PyTorch implementation of the
  same architecture whose state_dict keys are exactly the map's torch
  keys — whole-model random-weights torch-vs-flax output parity is
  locked in tests/test_torch_parity.py;
- `tools/import_torch_checkpoint.py`: converts a .pth via the map (with
  a user-overridable key-rename layer for real released checkpoints,
  e.g. 'fused_encoders.' -> 'encoder.' per reference
  emsanet/weights.py:22-26).
"""

from emsanet_tpu.torch_compat.name_map import emsanet_torch_name_map

__all__ = ["emsanet_torch_name_map"]
