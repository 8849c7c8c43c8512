"""Worker for tests/test_multihost.py: one of 2 processes in a CPU cluster.

Each process owns 2 virtual CPU devices and feeds its LOCAL half of the task
batch through shard_batch's multi-process branch
(jax.make_array_from_process_local_data); a jitted global mean then needs a
cross-process reduction, proving the multi-host feed + collective path works.
"""

import os
import sys


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4, jax.devices()

    import jax.numpy as jnp
    import numpy as np

    from wmfml_tpu.parallel.mesh import MeshContext, shard_batch

    mesh_ctx = MeshContext.create({"data": 4, "model": 1})
    # global batch: task t has constant value t + 1 (t in 0..3);
    # this process holds tasks [2*pid, 2*pid + 1]
    local_tasks = np.arange(2 * pid, 2 * pid + 2)
    local = {
        "ctx_x": np.stack([np.full((3, 4, 4, 1), t + 1.0, np.float32)
                           for t in local_tasks]),
        "ctx_y": np.stack([np.full((3, 2), 10.0 * (t + 1), np.float32)
                           for t in local_tasks]),
    }
    batch = shard_batch(mesh_ctx.mesh, local)
    assert batch["ctx_x"].shape == (4, 3, 4, 4, 1)  # GLOBAL shape

    @jax.jit
    def global_stats(b):
        return jnp.mean(b["ctx_x"]), jnp.mean(b["ctx_y"])

    mx, my = global_stats(batch)
    # mean over tasks 1..4 => 2.5; labels 10..40 => 25
    np.testing.assert_allclose(float(mx), 2.5, rtol=1e-6)
    np.testing.assert_allclose(float(my), 25.0, rtol=1e-6)

    # --- checkpoint round-trip across the cluster (round-2 VERDICT #9) ---
    # every process participates in the orbax save of a SHARDED state and
    # restores its own shards back bit-exactly (SURVEY §5 checkpoint plan:
    # preemption recovery must work on multi-host meshes, not just chip 0)
    import optax

    from wmfml_tpu.ckpt.checkpoint import CheckpointManager
    from wmfml_tpu.train.state import TrainState

    run_dir = sys.argv[3]
    w_local = np.stack([np.full((8,), float(t + 1), np.float32)
                        for t in local_tasks])          # this host's rows
    sharded = shard_batch(mesh_ctx.mesh, {"w": w_local})
    state = TrainState.create({"params": {"w": sharded["w"]}},
                              optax.sgd(0.1))
    state = state.replace(step=np.asarray(7, np.int32))
    mgr = CheckpointManager(run_dir)
    mgr.save("model_multihost", state)
    mgr.wait()

    blank = TrainState.create(
        {"params": {"w": shard_batch(mesh_ctx.mesh,
                                     {"w": np.zeros_like(w_local)})["w"]}},
        optax.sgd(0.1))
    restored = CheckpointManager(run_dir).restore("model_multihost", blank)
    assert int(restored.step) == 7
    got_local = [shard.data for shard in
                 restored.params["w"].addressable_shards]
    want = np.stack([np.full((8,), float(t + 1), np.float32)
                     for t in local_tasks])
    got = np.concatenate([np.asarray(s).reshape(-1, 8) for s in got_local])
    np.testing.assert_array_equal(np.sort(got, axis=0), want)

    print(f"worker {pid}: ok mx={float(mx)} my={float(my)} ckpt=roundtrip",
          flush=True)


if __name__ == "__main__":
    main()
