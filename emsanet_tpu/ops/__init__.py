from emsanet_tpu.ops.grouping import group_pixels_argmin  # noqa: F401
