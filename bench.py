#!/usr/bin/env python
"""Benchmark: meta-train task throughput + MFU, per workload family.

Headline metric (the one JSON line's value): ANP ShapeNet1D meta-training
tasks/sec/chip — the flagship configuration (FAVOR+ cross-attention + DA +
TA, reference production batch: tasks_per_batch=10, ctx 15, 128x128). TRUE
end-to-end training: device-resident split, on-device episode sampling +
augmentation + forward + backward + Adam in fused multi-step dispatches.

Also measured (carried in the "extra" field; the driver records the full
line in BENCH_r{N}.json): ANP ShapeNet3D (online backgrounds), MAML and
MMAML ShapeNet1D (5 inner steps, second order). Per workload we report
model FLOPs/step from XLA's own cost analysis of a K=1 compile of the same
workload (HLO cost analysis counts scan/while bodies ONCE regardless of
trip count, so the K-step program's numbers are neither per-call nor
per-step), achieved FLOP/s, and MFU against the chip's bf16 peak.

Timing forces a host fetch of the final loss — on this platform
``block_until_ready`` returns before remote execution completes, so a fetch
is the only honest clock (RESULTS.md "Measurement integrity").

vs_baseline: the reference publishes no numbers (BASELINE.md), so we
MEASURED it (scripts/ref_baseline.py runs the actual /root/reference
classes on the byte-compatible synthetic data; REFBASE.json):
  - full reference loop, torch CPU:            8.92 tasks/s
  - sampling-only ceiling (the reference samples episodes synchronously on
    the host, trainer/model_trainer.py:64-70, so ANY accelerator backend
    is bounded by tasks_per_batch / t(get_batch)):  847 tasks/s
Both numbers EXCLUDE imgaug (not installed) — i.e. they overstate the
reference, whose shipped DA+TA config pays imgaug per batch on the host.
vs_baseline divides by the 847 ceiling — the most conservative measured
denominator (a real GPU reference also pays H2D + forward + backward).
The measured-loop multiple is carried in extra.baselines.
"""

from __future__ import annotations

import json
import os
import time

# measured ceiling of the reference on ANY accelerator (REFBASE.json,
# sampling_bound_tasks_per_sec); its measured CPU loop is 8.92 tasks/s
REFERENCE_TASKS_PER_SEC = 847.0
REFERENCE_CPU_LOOP_TASKS_PER_SEC = 8.92

# dense bf16 peak FLOP/s per chip (public spec sheets)
PEAK_FLOPS = {"v4": 275e12, "v5e": 197e12, "v5p": 459e12, "v6e": 918e12}


def chip_peak() -> float:
    gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
    return PEAK_FLOPS.get(gen, PEAK_FLOPS["v5e"])


def base_cfg(**kw):
    from wmfml_tpu.configs import Config

    d = dict(
        method="ANPShapeNet1D", task="shapenet_1d",
        aug_list=["task_aug", "data_aug"], checkpoint="",
        agg_mode="attention", loss_type="mse", tasks_per_batch=10,
        max_ctx_num=15, query_num=15, data_size="large", dim_w=64,
        n_hidden_units_r=[100, 100], dim_r=64, dim_z=64, noise_scale=0.0,
        lr=1e-4, weight_decay=False, optimizer="Adam", bg_gen_freq=1000,
        val_iters=1, val_freq=10**9, iterations=1, device="tpu", seed=0,
        # steps_per_call=64: interleaved sweep (RESULTS.md round 3) measured
        # 4.01/3.01/2.81/2.49/2.44/2.36 ms/step at K=8/16/32/64/128/256 in
        # one window; 64 is the production recommendation (val cadence 64
        # ~= the reference's 50; beyond it is <5% for 4x staging HBM)
        synthetic_data=True, steps_per_call=64, compute_dtype="bfloat16",
        # HEADLINE SEMANTICS (round-5 swap, VERDICT r4 item 2): the
        # headline runs the SHIPPED DEFAULT — exact imgaug semantics
        # (aug_random_order=True, configs/config.py default; imgaug
        # Sequential(random_order=True) is the reference default,
        # utils/augment.py:61-63). The perf pipeline
        # (aug_random_order=False, cfg/train/perf) is measured as its own
        # "anp_shapenet1d_perf_aug" row below, never as the headline.
    )
    d.update(kw)
    return Config.from_dict(d, make_dirs=False)


def build_step(cfg):
    """(step_callable, state, K) for cfg's method family."""
    import jax

    from wmfml_tpu.data.device_sampler import from_dataset
    from wmfml_tpu.data.factory import build_data
    from wmfml_tpu.models.registry import build_model
    from wmfml_tpu.parallel.mesh import MeshContext
    from wmfml_tpu.train.state import TrainState, build_optimizer

    data = build_data(cfg, mode="train")
    model = build_model(cfg)
    mesh_ctx = MeshContext.create(cfg.mesh_shape,
                                  batch_divisor=cfg.tasks_per_batch)
    key = jax.random.PRNGKey(0)
    K = cfg.steps_per_call
    sampler = from_dataset(data, cfg)
    assert sampler is not None, "train split must fit in HBM for this bench"

    if cfg.method == "MMAMLShapeNet1D":
        from wmfml_tpu.train.mmaml import (MMAMLTrainer,
                                           build_mmaml_device_train_step,
                                           build_mmaml_optimizer,
                                           build_mmaml_outer)

        bundle = model
        tx = build_mmaml_optimizer(cfg)
        tr = object.__new__(MMAMLTrainer)
        tr.bundle, tr.config = bundle, cfg
        variables = MMAMLTrainer._init_variables(tr, key)
        state = jax.device_put(TrainState.create(variables, tx),
                               mesh_ctx.replicated)
        outer = build_mmaml_outer(bundle, cfg, int(cfg.num_steps),
                                  train=True, test=False)
        step = build_mmaml_device_train_step(bundle, cfg, sampler, mesh_ctx,
                                             tx, K, outer)
    elif cfg.method.startswith("MAML"):
        from wmfml_tpu.train.maml import (MAMLTrainer,
                                          build_maml_device_train_step,
                                          build_maml_outer)

        tx = build_optimizer(cfg)
        tr = object.__new__(MAMLTrainer)
        tr.model, tr.config = model, cfg
        variables = MAMLTrainer._init_variables(tr, key)
        state = jax.device_put(TrainState.create(variables, tx),
                               mesh_ctx.replicated)
        outer = build_maml_outer(model, cfg, int(cfg.num_steps),
                                 train=True, test=False)
        step = build_maml_device_train_step(model, cfg, sampler, mesh_ctx,
                                            tx, K, outer)
    else:
        from wmfml_tpu.train.steps import (build_device_data_train_step,
                                           init_model)

        tx = build_optimizer(cfg)
        state = jax.device_put(
            TrainState.create(init_model(model, cfg, key), tx),
            mesh_ctx.replicated)
        step = build_device_data_train_step(model, cfg, sampler, mesh_ctx,
                                            tx, K)
    return step, state, K


def step_cost(cfg, deadline: float = float("inf")):
    """Per-step (flops, bytes) from a K=1 AOT compile of the same workload.

    HLO cost analysis counts a while/scan body ONCE regardless of trip
    count (measured: lax.scan of the same matmul at length 4/16/64 all
    report identical flops), so the K-step training program's cost numbers
    are neither per-call nor per-step — through round 2 this understated
    per-step FLOPs/MFU by ~K. A K=1 program's body + staging is exactly
    one step, so its cost IS the per-step cost.
    """
    import copy

    import jax

    if time.perf_counter() > deadline:
        return None, None
    cfg1 = copy.copy(cfg)
    cfg1.steps_per_call = 1
    step, state, _ = build_step(cfg1)
    try:
        compiled = step._jitted.lower(state, step._arrays(),
                                      jax.random.PRNGKey(0)).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return (float(cost.get("flops", 0.0)) or None,
                float(cost.get("bytes accessed", 0.0)) or None)
    except Exception:
        return None, None  # cost is best-effort; throughput stays honest


def run_workload(name: str, cfg, calls: int,
                 deadline: float = float("inf")) -> dict:
    import jax

    step, state, K = build_step(cfg)
    key = jax.random.PRNGKey(7)

    # compile the timed K-step program ahead-of-time; per-step flops/bytes
    # come from a separate K=1 compile (see step_cost docstring)
    arrays = step._arrays()
    compiled = step._jitted.lower(state, arrays,
                                  jax.random.fold_in(key, 0)).compile()
    flops_per_step, bytes_per_step = step_cost(cfg, deadline)

    for i in range(2):  # warmup (fetch forces completion)
        state, metrics = compiled(state, arrays, jax.random.fold_in(key, i))
    _ = float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(calls):
        state, metrics = compiled(state, arrays,
                                  jax.random.fold_in(key, 100 + i))
    final_loss = float(metrics["loss"])  # the real sync point
    dt = time.perf_counter() - t0

    assert final_loss == final_loss, f"{name}: NaN loss in benchmark"
    steps = calls * K
    # cost_analysis spans the whole mesh and tasks_per_batch is the global
    # batch — normalize both by device count so "per_chip" stays honest on
    # multi-chip meshes (single-chip: n_dev == 1, no change)
    n_dev = jax.device_count()
    out = {
        "tasks_per_sec": round(steps * cfg.tasks_per_batch / dt / n_dev, 2),
        "ms_per_step": round(1000 * dt / steps, 3),
    }
    if flops_per_step:
        achieved = flops_per_step * steps / dt / n_dev
        # per-chip like every other column (cost spans the whole mesh)
        out["gflops_per_step"] = round(flops_per_step / n_dev / 1e9, 2)
        out["tflops_per_sec"] = round(achieved / 1e12, 2)
        out["mfu_pct"] = round(100 * achieved / chip_peak(), 2)
    if bytes_per_step:
        out["hbm_gb_per_sec"] = round(
            bytes_per_step * steps / dt / n_dev / 1e9, 1)
    return out


def main():
    fast = os.environ.get("BENCH_FAST", "") not in ("", "0")
    # the axon remote-compile service has degraded phases where a trivial
    # compile takes minutes; never let the secondary workloads starve the
    # headline JSON line
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1200"))
    t_start = time.perf_counter()
    deadline = t_start + budget_s
    results = {}

    headline_cfg = base_cfg()
    probe_history = []  # provenance: every probe attempt, timestamped, so a
    # zeroed round is distinguishable from a never-ran one at a glance
    try:
        # watchdog: during platform outages the axon backend HANGS inside
        # PJRT client init (a C call — Python signal handlers never fire),
        # so probe it in a SUBPROCESS with a hard timeout before committing
        # this process to a backend that may never come up
        import subprocess
        import sys

        probe_s = max(60, min(420, int(budget_s * 0.4)))
        attempts = 2 if budget_s > 3 * probe_s else 1
        for attempt in range(attempts):
            entry = {"attempt": attempt + 1,
                     "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                          time.gmtime()),
                     "timeout_s": probe_s}
            t_probe = time.perf_counter()
            try:
                probe = subprocess.run(
                    [sys.executable, "-c",
                     "import jax; "
                     "jax.jit(lambda x: x + 1)(1.0).block_until_ready()"],
                    timeout=probe_s, capture_output=True)
                entry["elapsed_s"] = round(time.perf_counter() - t_probe, 1)
                entry["rc"] = probe.returncode
                if probe.returncode != 0:
                    entry["stderr_tail"] = probe.stderr.decode(
                        errors="replace")[-200:]
                probe_history.append(entry)
                if probe.returncode == 0:
                    break
                if attempt == attempts - 1:
                    raise RuntimeError(
                        "backend probe failed: "
                        + probe.stderr.decode(errors="replace")[-200:])
            except subprocess.TimeoutExpired:
                entry["elapsed_s"] = round(time.perf_counter() - t_probe, 1)
                entry["rc"] = "timeout"
                probe_history.append(entry)
                if attempt == attempts - 1:
                    raise
        results["anp_shapenet1d"] = run_workload(
            "anp_shapenet1d", headline_cfg, calls=25, deadline=deadline)
    except Exception as e:
        # never exit without the one JSON line — e.g. the axon backend
        # going UNAVAILABLE (observed: a multi-hour platform outage) must
        # be distinguishable from a perf regression in the record
        print(json.dumps({
            "metric": "meta_train_tasks_per_sec_per_chip", "value": 0,
            "unit": "tasks/s", "vs_baseline": 0,
            "extra": {"error": f"{type(e).__name__}: {e}"[:300],
                      "probe_history": probe_history,
                      "note": "headline workload could not run; value 0 "
                              "is a sentinel, not a measurement"},
        }))
        return

    if not fast:
        maml_kw = dict(
            aug_list=["data_aug"], agg_mode=None, dim_w=196, num_filters=64,
            num_updates=5, test_num_updates=20, first_order=False,
            update_lr=0.002, beta=0.001, lr=5e-4, steps_per_call=4)
        workloads = {
            # throughput-tuned batch (cfg/train/perf .._T40): per-task cost
            # keeps dropping past the reference batch; reported alongside
            # the reference-batch headline, never in place of it
            "anp_shapenet1d_t40": base_cfg(tasks_per_batch=40),
            "anp_shapenet1d_perf_aug": base_cfg(aug_random_order=False),
            "anp_shapenet3d": base_cfg(
                method="ANP", task="shapenet_3d", img_agg="reshape",
                tasks_per_batch=20, max_ctx_num=15, query_num=15,
                dim_w=None, gen_bg=True, steps_per_call=64),
            "maml_shapenet1d": base_cfg(method="MAMLShapeNet1D", **maml_kw),
            # throughput-optimal batch from the round-5 interleaved sweep
            # (scripts/maml_batch_sweep.py: T20 +66% tasks/s over the
            # reference batch T10; T40 regresses). MMAML measured flat in
            # T (its optimum IS the reference batch), so it has no extra row.
            "maml_shapenet1d_t20": base_cfg(method="MAMLShapeNet1D",
                                            **dict(maml_kw,
                                                   tasks_per_batch=20)),
            "mmaml_shapenet1d": base_cfg(
                method="MMAMLShapeNet1D",
                **dict(maml_kw, aug_list=["data_aug", "task_aug"])),
        }
        for name, cfg in workloads.items():
            if time.perf_counter() - t_start > budget_s:
                results[name] = {"skipped": "bench time budget exhausted "
                                            "(degraded compile service)"}
                continue
            try:
                results[name] = run_workload(name, cfg, calls=8,
                                             deadline=deadline)
            except Exception as e:  # never lose the headline line
                results[name] = {"error": f"{type(e).__name__}: {e}"[:200]}

    head = results["anp_shapenet1d"]
    tasks_per_sec = head["tasks_per_sec"]
    results["baselines"] = {
        "ref_accelerator_ceiling_tasks_per_sec": REFERENCE_TASKS_PER_SEC,
        "ref_measured_cpu_loop_tasks_per_sec":
            REFERENCE_CPU_LOOP_TASKS_PER_SEC,
        "vs_measured_cpu_loop": round(
            tasks_per_sec / REFERENCE_CPU_LOOP_TASKS_PER_SEC, 1),
        "note": "measured via scripts/ref_baseline.py (REFBASE.json); "
                "vs_baseline uses the sampling-bound accelerator ceiling",
    }
    print(json.dumps({
        "metric": "meta_train_tasks_per_sec_per_chip",
        "value": tasks_per_sec,
        "unit": "tasks/s",
        "vs_baseline": round(tasks_per_sec / REFERENCE_TASKS_PER_SEC, 3),
        "extra": results,
    }))


if __name__ == "__main__":
    main()
