#!/usr/bin/env python
"""Measured roofline for the headline training steps (VERDICT r4 items 1-2).

Captures a jax.profiler trace of the CURRENT fused train step (the round-4
capture in hbm_profile.json predates the optax.flatten removal and the
hash-dropout landing, so its op mix is stale), then reduces the xplane
op-profile to a compact, reviewable summary:

  * window accounting: capture wall, device busy, IDLE — with the idle
    split into "edge" (trace-start gap + final host fetch RTT, a
    measurement artifact of the tunneled device) vs what is attributable
    to steady-state inter-dispatch gaps,
  * per-step device time by category and for the top ops,
  * per-op speed-of-light estimates from the measured bytes (HBM
    820 GB/s on v5e) so "X% of program at Y% BW" claims are grounded in
    hardware counters, not HLO byte upper bounds.

Usage: python scripts/roofline.py [exact|perf|maml|all] [--calls 8]
Writes results/profiles/roofline_<name>.json (compact).
"""

import glob
import json
import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V5E_HBM_GBPS = 820.0
V5E_BF16_TFLOPS = 197.0


def capture(name: str, cfg, trace_dir: str, calls: int):
    import jax

    from bench import build_step

    step, state, K = build_step(cfg)
    arrays = step._arrays()
    compiled = step._jitted.lower(state, arrays,
                                  jax.random.PRNGKey(0)).compile()
    for i in range(2):
        state, m = compiled(state, arrays, jax.random.PRNGKey(i))
    _ = float(m["loss"])  # warmup fully retired before the trace opens

    run_dir = os.path.join(trace_dir, name)
    t0 = time.perf_counter()
    jax.profiler.start_trace(run_dir)
    t_trace0 = time.perf_counter()
    for i in range(calls):
        state, m = compiled(state, arrays,
                            jax.random.fold_in(jax.random.PRNGKey(7), i))
    t_submit = time.perf_counter()
    loss = float(m["loss"])  # the only sync; device pipelines all calls
    t_sync = time.perf_counter()
    jax.profiler.stop_trace()
    return run_dir, {
        "steps_per_call": K, "calls": calls, "loss": loss,
        "host_submit_s": round(t_submit - t_trace0, 4),
        "host_wall_s": round(t_sync - t_trace0, 4),
        "trace_open_s": round(t_trace0 - t0, 4),
    }


def module_timeline(run_dir: str):
    """Per-execution timeline of XLA modules on the TPU plane.

    Answers the round-4 open question directly: is the window idle a real
    steady-state inter-dispatch gap (attackable) or a trace-start edge
    artifact (not)? Returns a list of (name, start_ms, dur_ms) plus the
    derived segmentation.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xplanes = sorted(glob.glob(os.path.join(run_dir, "**", "*.xplane.pb"),
                               recursive=True), key=os.path.getmtime)
    xs = xplane_pb2.XSpace()
    with open(xplanes[-1], "rb") as f:
        xs.ParseFromString(f.read())
    plane = next(p for p in xs.planes if p.name == "/device:TPU:0")
    emeta = plane.event_metadata
    line = next(l for l in plane.lines if l.name == "XLA Modules")
    evs = sorted(line.events, key=lambda e: e.offset_ps)
    if not evs:
        return None
    t0 = evs[0].offset_ps
    mods = [(emeta[e.metadata_id].name.split("(")[0],
             (e.offset_ps - t0) / 1e9, e.duration_ps / 1e9) for e in evs]
    # the main program = the module with the largest total time
    totals = {}
    for name, _, dur in mods:
        totals[name] = totals.get(name, 0.0) + dur
    main_name = max(totals, key=totals.get)
    main = [(s, d) for n, s, d in mods if n == main_name]
    first_start = main[0][0]
    last_end = max(s + d for s, d in main)
    inter_gap = (last_end - first_start) - sum(d for _, d in main)
    return {
        "main_module": main_name,
        "executions": len(main),
        "edge_gap_ms": round(first_start, 3),   # trace open -> first program
        "steady_span_ms": round(last_end - first_start, 3),
        "steady_busy_ms": round(sum(d for _, d in main), 3),
        "steady_inter_dispatch_gap_ms": round(inter_gap, 3),
        "steady_idle_pct": round(100 * inter_gap /
                                 max(last_end - first_start, 1e-9), 2),
        "aux_modules_ms": round(sum(d for n, _, d in mods
                                    if n != main_name), 4),
    }


def op_profile(run_dir: str):
    try:
        from xprof.convert import raw_to_tool_data as rttd
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd

    xplanes = glob.glob(os.path.join(run_dir, "**", "*.xplane.pb"),
                        recursive=True)
    # keep only the NEWEST capture session — a stale prior dump in the same
    # run_dir makes the converter return None for the mixed set
    xplanes = sorted(xplanes, key=os.path.getmtime)[-1:]
    data = rttd.xspace_to_tool_data(xplanes, "op_profile^", {})
    if isinstance(data, tuple):
        data = data[0]
    return json.loads(data)


def summarize(op, timing) -> dict:
    root = op["byProgram"]
    steps = timing["steps_per_call"] * timing["calls"]
    window_ms = root["metrics"]["rawTime"] / 1e9
    idle_ms = 0.0
    progs = []
    for ch in root.get("children", []):
        t = ch["metrics"]["rawTime"] / 1e9
        if ch["name"] == "IDLE":
            idle_ms = t
        else:
            progs.append((t, ch))
    progs.sort(reverse=True, key=lambda x: x[0])
    busy_ms = sum(t for t, _ in progs)
    main_t, main = progs[0]

    cats = []
    for cat in sorted(main.get("children", []),
                      key=lambda c: -c["metrics"]["rawTime"]):
        m = cat["metrics"]
        cats.append({
            "category": cat["name"],
            "us_per_step": round(m["rawTime"] / 1e6 / steps, 2),
            "pct_of_program": round(100 * m["rawTime"] / main_t / 1e9, 2),
            "hbm_bw_util": round(m["bandwidthUtils"][0], 3),
            "flops_util": round(m["flops"], 4),
        })

    # fusion-level granularity: category -> fusion/op. Recursing further
    # (into a fusion's constituent HLO instructions) fragments the time
    # attribution and buries the actionable unit (the fusion XLA scheduled).
    ops = []
    for cat in main.get("children", []):
        ops.extend(cat.get("children", []) or [cat])
    ops.sort(key=lambda c: -c["metrics"]["rawTime"])
    top = []
    for ch in ops[:20]:
        m = ch["metrics"]
        t_us = m["rawTime"] / 1e6 / steps
        gb = sum(m["rawBytesAccessedArray"]) / 1e9 / steps
        sol_us = gb / V5E_HBM_GBPS * 1e6
        xla = ch.get("xla", {})
        top.append({
            "op": ch["name"],
            "us_per_step": round(t_us, 2),
            "pct_of_program": round(100 * m["rawTime"] / main_t / 1e9, 2),
            "hbm_bw_util": round(m["bandwidthUtils"][0], 3),
            "measured_gb_per_step": round(gb, 5),
            "hbm_sol_us": round(sol_us, 2),
            "headroom_us": round(max(0.0, t_us - sol_us), 2),
            "provenance": xla.get("provenance", "")[-90:],
            "expression": xla.get("expression", "")[:120],
        })

    pm = main["metrics"]
    return {
        "steps": steps,
        "host_wall_ms_per_step": round(timing["host_wall_s"] * 1e3 / steps, 4),
        "window_ms": round(window_ms, 2),
        "device_busy_ms": round(busy_ms, 2),
        "idle_ms": round(idle_ms, 2),
        "idle_pct_of_window": round(100 * idle_ms / window_ms, 1),
        "program_ms_per_step": round(main_t / steps, 4),
        "program_hbm_bw_util": round(pm["bandwidthUtils"][0], 4),
        "program_flops_util": round(pm["flops"], 4),
        "program_measured_gb_per_step": round(
            sum(pm["rawBytesAccessedArray"]) / 1e9 / steps, 4),
        "program_hbm_sol_ms_per_step": round(
            sum(pm["rawBytesAccessedArray"]) / 1e9 / steps
            / V5E_HBM_GBPS * 1e3, 4),
        "other_programs_ms": round(sum(t for t, _ in progs[1:]), 3),
        "categories": cats,
        "top_ops": top,
        "timing": timing,
    }


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    calls = 8
    for i, a in enumerate(sys.argv):
        if a == "--calls" and i + 1 < len(sys.argv):
            calls = int(sys.argv[i + 1])

    from bench import base_cfg

    jobs = {}
    # base_cfg() runs the shipped default (exact aug semantics) since the
    # round-5 headline swap; the perf pipeline must opt out explicitly
    if which in ("exact", "all"):
        jobs["exact"] = base_cfg()
    if which in ("perf", "all"):
        jobs["perf"] = base_cfg(aug_random_order=False)
    if which in ("maml", "all"):
        jobs["maml"] = base_cfg(
            method="MAMLShapeNet1D", aug_list=["data_aug"], agg_mode=None,
            dim_w=196, num_filters=64, num_updates=5, test_num_updates=20,
            first_order=False, update_lr=0.002, beta=0.001, lr=5e-4,
            steps_per_call=4)

    os.makedirs("results/profiles", exist_ok=True)
    for name, cfg in jobs.items():
        print(f"[roofline] capturing {name} ...", flush=True)
        run_dir, timing = capture(name, cfg, f"/tmp/roofline/{name}", calls)
        res = summarize(op_profile(run_dir), timing)
        res["workload"] = name
        try:
            res["timeline"] = module_timeline(run_dir)
        except Exception as e:  # timeline is additive evidence, not a gate
            res["timeline"] = {"error": f"{type(e).__name__}: {e}"[:200]}
        out = f"results/profiles/roofline_{name}.json"
        with open(out, "w") as f:
            json.dump(res, f, indent=1)
        print(f"[roofline] {name}: program {res['program_ms_per_step']} "
              f"ms/step, wall {res['host_wall_ms_per_step']} ms/step, "
              f"idle {res['idle_pct_of_window']}% -> {out}", flush=True)


if __name__ == "__main__":
    main()
