"""EMSANet-TPU: a TPU-native multi-task RGB-D scene analysis framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
TUI-NICR/EMSANet (IJCNN 2022): efficient multi-task RGB-D scene analysis
(semantic segmentation, instance segmentation via center/offset, panoptic
segmentation, instance orientation estimation, and scene classification)
— built TPU-first:

- NHWC layouts and bf16 compute so convolutions tile onto the MXU,
- the whole forward + postprocessing path is a single ``jax.jit`` program
  (the reference's CPU panoptic merge is reformulated as fixed-shape,
  vectorized on-device ops),
- data parallelism over an ICI device mesh via ``shard_map``/``pjit``
  (the reference trains single-GPU; here multi-chip is first-class),
- AOT-compiled jit inference replaces the reference's ONNX→TensorRT path.

Reference behavior map: see SURVEY.md at the repo root. Reference files are
cited in docstrings as ``<path>:<line>`` relative to the upstream repo.
"""

__version__ = "0.1.0"

from emsanet_tpu.config import (  # noqa: F401
    DataConfig,
    EMSANetConfig,
    ModelConfig,
    TrainConfig,
)
