"""Mesh/sharding over the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from wmfml_tpu.parallel import MeshContext, create_mesh


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_default_mesh_all_data():
    ctx = MeshContext.create()
    assert ctx.num_data_shards == 8
    assert ctx.mesh.axis_names == ("data", "model")


def test_custom_mesh_shape():
    mesh = create_mesh({"data": 4, "model": 2})
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


def test_shard_batch_and_psum():
    ctx = MeshContext.create()
    batch = {
        "x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
        "y": np.ones((8, 2), np.float32),
    }
    sharded = ctx.put_batch(batch)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec("data")

    @jax.jit
    def global_sum(b):
        return jnp.sum(b["x"]) + jnp.sum(b["y"])

    got = float(global_sum(sharded))
    assert got == float(batch["x"].sum() + batch["y"].sum())
