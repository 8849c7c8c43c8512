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


def test_tp_param_sharding_rule_and_train_step():
    """Tensor-parallel placement: large 2-D kernels column-shard over
    "model"; a dp x tp train step runs and updates sharded params
    (parallel/mesh.py param_sharding_rule — the dryrun's TP phase, in CI)."""
    from wmfml_tpu.configs import Config
    from wmfml_tpu.models.registry import build_model
    from wmfml_tpu.parallel.mesh import (create_mesh, param_sharding_rule,
                                         shard_state, state_shardings)
    from wmfml_tpu.train.state import TrainState, build_optimizer
    from wmfml_tpu.train.steps import build_train_step, init_model

    cfg = Config.from_dict(dict(
        method="CondNeuralProcess", task="shapenet_3d", agg_mode="mean",
        img_agg="reshape", aug_list=[], loss_type="mse", tasks_per_batch=4,
        max_ctx_num=3, query_num=3, lr=1e-3, seed=0, gen_bg=False,
        mesh_shape={"data": 4, "model": 2}))
    cfg.img_size = [32, 32, 4]  # tests-only shrink (CPU conv cost; C stays 4=RGBA)
    mesh_ctx = MeshContext.create({"data": 4, "model": 2})
    rule = param_sharding_rule(mesh_ctx.mesh)
    big = np.zeros((512, 256), np.float32)
    small = np.zeros((16,), np.float32)
    assert "model" in str(rule(big).spec)
    assert rule(small).spec == jax.sharding.PartitionSpec()

    model = build_model(cfg)
    tx = build_optimizer(cfg)
    key = jax.random.PRNGKey(0)
    state = shard_state(mesh_ctx.mesh,
                        TrainState.create(init_model(model, cfg, key), tx))
    n_sharded = sum(1 for leaf in jax.tree_util.tree_leaves(state)
                    if hasattr(leaf, "sharding") and leaf.sharding.spec
                    and "model" in str(leaf.sharding.spec))
    assert n_sharded > 0
    step = build_train_step(
        model, cfg, mesh_ctx, tx,
        state_sharding=state_shardings(mesh_ctx.mesh, state))

    rng = np.random.RandomState(0)
    batch = mesh_ctx.put_batch(dict(
        ctx_x=rng.rand(4, 3, 32, 32, 3).astype(np.float32),
        ctx_y=rng.rand(4, 3, 4).astype(np.float32),
        ctx_mask=np.ones((4, 3), bool),
        qry_x=rng.rand(4, 3, 32, 32, 3).astype(np.float32),
        qry_y=rng.rand(4, 3, 4).astype(np.float32)))
    new_state, metrics = step(state, batch, key)
    assert np.isfinite(float(metrics["loss"]))
    # updated params keep their TP placement
    leaf = [x for x in jax.tree_util.tree_leaves(new_state.params)
            if hasattr(x, "sharding") and x.sharding.spec
            and "model" in str(x.sharding.spec)]
    assert leaf, "TP placement lost after the update"
