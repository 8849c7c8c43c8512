"""Device mesh & sharding layer.

The reference is strictly single-device (`device: "cuda:0"` in every YAML; no
torch.distributed anywhere). Our TPU-native equivalent: one ``jax.sharding.Mesh``
with named axes

    ("data", "model")

where the episodic ``tasks_per_batch`` axis is sharded over "data" (pure DP —
gradient all-reduce rides ICI via XLA collectives inserted by the partitioner)
and "model" is plumbing for tensor-parallel layouts of larger variants. All
train/eval steps are jitted with NamedSharding in/out specs; nothing in the
model code mentions devices.

Multi-host: each host samples its local shard of tasks and
``jax.make_array_from_process_local_data`` assembles the global batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(mesh_shape: Optional[Dict[str, int]] = None,
                devices=None, batch_divisor: Optional[int] = None) -> Mesh:
    """Create a mesh. Default: all devices on the "data" axis, model=1.

    ``batch_divisor`` (typically tasks_per_batch): when given and the device
    count does not divide it, the data axis shrinks to the largest divisor —
    small smoke-test batches still run on a big mesh (using fewer devices).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if mesh_shape is None:
        if batch_divisor is not None and batch_divisor % n != 0:
            n_fit = max(d for d in range(1, n + 1) if batch_divisor % d == 0)
            # never shrink silently: a production 8-chip run with
            # tasks_per_batch=10 would otherwise quietly train on 2 chips
            import logging

            logging.getLogger("wmfml_tpu").warning(
                "create_mesh: batch of %d tasks does not divide %d devices "
                "— data axis shrunk to %d device(s); %d device(s) IDLE. "
                "Pick tasks_per_batch divisible by the device count to use "
                "the whole mesh.", batch_divisor, n, n_fit, n - n_fit)
            n = n_fit
            devices = devices[:n]
        mesh_shape = {DATA_AXIS: n, MODEL_AXIS: 1}
    axis_names = tuple(mesh_shape.keys())
    sizes = tuple(mesh_shape.values())
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh shape {mesh_shape} != #devices {n}")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (task) axis over the data axis; rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host-side pytree batch on the mesh, task axis over "data".

    Single-process path uses device_put; multi-process path builds a global
    array from per-process shards (each host feeds its local slice of the
    task axis; exercised by tests/test_multihost.py on a 2-process CPU
    cluster).
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )


def param_sharding_rule(mesh: Mesh, min_size: int = 32768):
    """Tensor-parallel placement rule: 2-D+ kernels of >= min_size elements
    shard their LAST axis over "model" (column-parallel dense — XLA inserts
    the all-gather/reduce-scatter pair); everything else is replicated.
    With model=1 the rule degenerates to full replication."""
    model_n = mesh.shape[MODEL_AXIS]
    repl = replicated_sharding(mesh)

    def rule(x):
        shape = getattr(x, "shape", ())
        if (model_n > 1 and len(shape) >= 2
                and int(np.prod(shape)) >= min_size
                and shape[-1] % model_n == 0):
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 1)), MODEL_AXIS))
        return repl

    return rule


def state_shardings(mesh: Mesh, state, min_size: int = 32768):
    """Sharding pytree for a TrainState under the TP rule (params and the
    optimizer moments mirror each other, so one shape-based rule covers
    both)."""
    rule = param_sharding_rule(mesh, min_size)
    return jax.tree_util.tree_map(rule, state)


def shard_state(mesh: Mesh, state, min_size: int = 32768):
    """Place a TrainState per the TP rule."""
    rule = param_sharding_rule(mesh, min_size)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rule(x)), state)


@dataclass
class MeshContext:
    """Owns the mesh plus the shardings train/eval steps are jitted with."""

    mesh: Mesh

    @classmethod
    def create(cls, mesh_shape: Optional[Dict[str, int]] = None, devices=None,
               batch_divisor: Optional[int] = None):
        return cls(mesh=create_mesh(mesh_shape, devices, batch_divisor))

    @property
    def data_sharding(self) -> NamedSharding:
        return batch_sharding(self.mesh)

    @property
    def replicated(self) -> NamedSharding:
        return replicated_sharding(self.mesh)

    @property
    def num_data_shards(self) -> int:
        return self.mesh.shape[DATA_AXIS]

    def put_batch(self, batch):
        return shard_batch(self.mesh, batch)
