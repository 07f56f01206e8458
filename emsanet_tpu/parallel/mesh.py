"""Device-mesh data parallelism.

The reference trains single-process, single-GPU (SURVEY.md §2.4: no
DDP/FSDP/NCCL anywhere). The TPU-native framework makes multi-chip
scaling first-class instead:

- 1-D 'data' mesh over ICI (`jax.sharding.Mesh`),
- the train step runs under `shard_map`: each chip computes grads on its
  batch shard, `lax.pmean` over the mesh axis all-reduces grads +
  batch-norm statistics + loss metrics across ICI,
- params/optimizer state are replicated (the model is ~35M params;
  replication + psum is the bandwidth-optimal layout at this scale —
  no FSDP-style sharding needed),
- multi-host: `jax.distributed.initialize` + per-host input shards feed
  the same program (gradient all-reduce rides ICI within a slice, DCN
  across slices — XLA inserts the hierarchical collective).

Used by training config 5 of BASELINE.json (NYUv2 multi-task training
data-parallel on v5e-8).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map  # public API since jax 0.8
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"Requested {n_devices} devices but only {len(devices)} "
                "available."
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def _batch_spec(x, axis: str):
    if hasattr(x, "ndim") and x.ndim > 0:
        return P(axis, *([None] * (x.ndim - 1)))
    return P()


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place batch arrays sharded on the leading (batch) axis."""
    axis = mesh.axis_names[0]
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, _batch_spec(x, axis)))
        if hasattr(x, "ndim")
        else x,
        batch,
    )


def replicate_state(state, mesh: Mesh):
    """Replicate the train state across the mesh.

    Returns fresh buffers: a plain `device_put` may alias the source
    array's buffer for the shard that already sits on the right device,
    and the donated parallel train step (`make_parallel_train_step`,
    donate_argnums=0) would then delete the CALLER's original arrays —
    "Array has been deleted" on next use. A jitted identity with
    out_shardings never aliases its inputs.
    """
    sharding = NamedSharding(mesh, P())
    copy = jax.jit(lambda x: x, out_shardings=sharding)
    return jax.tree.map(
        lambda x: copy(jnp.asarray(x)) if hasattr(x, "ndim") else x,
        state,
    )


def make_parallel_train_step(model, cfg, class_weights, mesh: Mesh):
    """Data-parallel train step: `shard_map` over the 1-D 'data' mesh.

    Batch sharded on axis 0, state replicated; gradients/metrics pmean-ed
    inside the mapped step, so outputs are replicated. The jit cache is
    keyed on pytree structure + shapes, so the shard_map is built per
    batch structure but compiled once.
    """
    from emsanet_tpu.training.step import make_train_step

    axis = mesh.axis_names[0]
    inner = make_train_step(model, cfg, class_weights, axis_name=axis)

    @functools.cache
    def build(batch_treedef, batch_ndims):
        batch_specs = jax.tree.unflatten(
            batch_treedef,
            [P(axis, *([None] * (nd - 1))) if nd > 0 else P()
             for nd in batch_ndims],
        )
        mapped = shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(), batch_specs, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        # donate the replicated state buffers (in-place update across steps)
        return jax.jit(mapped, donate_argnums=0)

    def step(state, batch, rng):
        leaves, treedef = jax.tree.flatten(batch)
        ndims = tuple(getattr(l, "ndim", 0) for l in leaves)
        return build(treedef, ndims)(state, batch, rng)

    return step


def make_parallel_eval_step(
    model,
    cfg,
    is_thing,
    mesh: Mesh,
    depth_stats=None,
    raw_depth: bool = False,
    use_orientations=None,
):
    """Sharded eval step: forward + full postprocessing under the mesh.

    The batch is sharded on axis 0; every chip postprocesses its own
    shard (the panoptic merge is per-image, so no cross-chip collective
    is needed) and the prediction dict comes back sharded on axis 0 —
    the multi-device analog of `training.step.make_eval_step`.
    """
    from emsanet_tpu.training.step import make_eval_step

    axis = mesh.axis_names[0]
    inner = make_eval_step(
        model, cfg, is_thing,
        depth_stats=depth_stats, raw_depth=raw_depth,
        use_orientations=use_orientations,
    )

    @functools.cache
    def build(batch_treedef, batch_shapes_dtypes):
        batch_specs = jax.tree.unflatten(
            batch_treedef,
            [P(axis, *([None] * (len(sd[0]) - 1))) if sd[0] else P()
             for sd in batch_shapes_dtypes],
        )
        # every postprocess output keeps its leading (batch) axis, so a
        # single P(axis) out_specs prefix shards the whole prediction dict
        mapped = shard_map(
            inner,
            mesh=mesh,
            in_specs=(P(), P(), batch_specs),
            out_specs=P(axis),
            check_vma=False,
        )
        return jax.jit(mapped)

    def step(params, batch_stats, batch):
        leaves, treedef = jax.tree.flatten(batch)
        shapes = tuple(
            (tuple(getattr(l, "shape", ())), np.asarray(l).dtype.str)
            for l in leaves
        )
        return build(treedef, shapes)(params, batch_stats, batch)

    return step
