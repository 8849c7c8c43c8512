#!/usr/bin/env python
"""Op-level xprof comparison of oneof_exact vs oneof_fixed augmenters.

Captures a jax.profiler trace of each augmenter-only jit (geometric + the
gated OneOf dropout) and prints the top-N ops by self time from the
op_profile tool, so the 1.23 ms oneof_exact tax (aug_drop_isolate.py) gets
an op-level attribution instead of a guess.

    python scripts/aug_op_profile.py [reps]
"""

import glob
import json
import os
import sys

# pre-gencode _pb2 modules in tensorboard_plugin_profile need the
# pure-python protobuf runtime (see hbm_profile.py)
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

sys.path.insert(0, ".")


def tool_data(run_dir, tool):
    try:
        from xprof.convert import raw_to_tool_data as rttd  # working native converter
    except ImportError:
        from tensorboard_plugin_profile.convert import raw_to_tool_data as rttd

    xplanes = glob.glob(run_dir + "/**/*.xplane.pb", recursive=True)
    data = rttd.xspace_to_tool_data(xplanes, tool, {})
    if isinstance(data, tuple):
        data = data[0]
    return data


def walk_ops(node, out, path=""):
    """Flatten the op_profile tree into (name, self_time_ps, flops, bytes)."""
    if not isinstance(node, dict):
        return
    m = node.get("metrics") or {}
    name = node.get("name", "?")
    if m.get("rawTime") or m.get("time"):
        out.append(dict(name=name, path=path,
                        time=m.get("rawTime", m.get("time", 0)),
                        flops=m.get("rawFlops", 0),
                        bytes=m.get("rawBytesAccessed", 0)))
    for ch in node.get("children", []) or []:
        walk_ops(ch, out, path + "/" + name)


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    import jax
    import jax.numpy as jnp

    from wmfml_tpu.aug import image_aug as ia

    imgs = jax.random.uniform(jax.random.PRNGKey(0), (300, 128, 128, 1),
                              jnp.bfloat16)

    def chained(ops):
        aug = ia.build_augmenter("shapenet_1d", random_order=False, ops=ops)

        def run(key, x):
            def body(c, i):
                k, x = c
                k, sub = jax.random.split(k)
                return (k, aug(sub, x)), ()
            (key, x), _ = jax.lax.scan(body, (key, x), jnp.arange(reps))
            return x
        return jax.jit(run)

    variants = {
        "oneof_exact": [ia.geometric, ia._DROP],
        "oneof_fixed": [ia.geometric, ia._DROP_FIXED],
    }
    for name, ops in variants.items():
        f = chained(ops)
        y = f(jax.random.PRNGKey(1), imgs)
        _ = float(jnp.float32(y).sum())
        run_dir = f"/tmp/augprof/{name}"
        jax.profiler.start_trace(run_dir)
        y = f(jax.random.PRNGKey(2), imgs)
        _ = float(jnp.float32(y).sum())
        jax.profiler.stop_trace()
        print(f"=== {name} ===", flush=True)
        op = None
        try:
            op = tool_data(run_dir, "op_profile")
            if isinstance(op, (bytes, str)):
                op = json.loads(op)
            ops_flat = []
            walk_ops(op.get("byProgram", op.get("byCategory", op)), ops_flat)
            ops_flat.sort(key=lambda d: -d["time"])
            tot = sum(d["time"] for d in ops_flat)
            for d in ops_flat[:25]:
                print(f"  {d['time']/1e6:9.3f}ms {d['name'][:90]}")
            print(f"  (sum {tot/1e6:.3f}ms over {len(ops_flat)} ops)")
        except Exception as e:
            print(f"  op_profile failed: {type(e).__name__}: {e}")
            print("  raw keys:", list(op)[:10] if isinstance(op, dict) else "?")


if __name__ == "__main__":
    main()
