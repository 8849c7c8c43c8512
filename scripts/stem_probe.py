#!/usr/bin/env python
"""Measure the backward-stem prize: how much of the headline step is the
conv0-side backward (conv1 input-grad + relu mask + conv0 weight-grad)?

Variant B stops the gradient after conv0+relu — NOT semantics-preserving
(conv0 stops learning); it exists purely to bound what a Pallas fused
backward-stem kernel could recover (the dilated conv, the 79 MB g_a0
write+read, and the conv0 weight-grad pass all disappear from the
program). Interleaved same-window timing like scripts/ab_bench.py.

Usage: python scripts/stem_probe.py [--passes 4] [--calls 6]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=4)
    ap.add_argument("--calls", type=int, default=6)
    args = ap.parse_args()

    import jax

    import bench
    from wmfml_tpu.nn import encoders

    orig_call = encoders.LiteratureEncoder.__call__
    PROBE = {"on": False}

    def patched(self, x):
        import flax.linen as nn

        from wmfml_tpu.nn.init import torch_bias_init, torch_kernel_init
        from wmfml_tpu.nn.mlp import Dense

        c_in = x.shape[-1]
        x = nn.Conv(32, (3, 3), strides=2, padding=[(1, 1), (1, 1)],
                    kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init(c_in * 9), dtype=self.dtype,
                    name="conv0")(x)
        x = nn.relu(x)
        if PROBE["on"]:
            x = jax.lax.stop_gradient(x)
        x = nn.Conv(48, (3, 3), strides=2, padding=[(1, 1), (1, 1)],
                    kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init(32 * 9), dtype=self.dtype,
                    name="conv1")(x)
        x = nn.relu(x)
        x = encoders.max_pool2(x, self.pool_impl)
        x = nn.Conv(64, (3, 3), strides=2, padding=[(1, 1), (1, 1)],
                    kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init(48 * 9), dtype=self.dtype,
                    name="conv2")(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return Dense(self.dim_w, dtype=self.dtype, name="fc")(x)

    encoders.LiteratureEncoder.__call__ = patched

    variants = {}
    key = jax.random.PRNGKey(7)
    for name, on in (("full_bwd", False), ("stem_stopgrad", True)):
        PROBE["on"] = on
        cfg = bench.base_cfg()
        step, state, K = bench.build_step(cfg)
        arrays = step._arrays()
        c = step._jitted.lower(state, arrays, key).compile()
        s, m = c(state, arrays, key)
        _ = float(m["loss"])
        variants[name] = dict(compiled=c, state=s, arrays=arrays, K=K)
        print(f"compiled {name}", flush=True)
    encoders.LiteratureEncoder.__call__ = orig_call

    for p in range(args.passes):
        line = []
        for name, v in variants.items():
            t0 = time.perf_counter()
            s = v["state"]
            for i in range(args.calls):
                s, m = v["compiled"](s, v["arrays"],
                                     jax.random.fold_in(key, 100 * p + i))
            _ = float(m["loss"])
            v["state"] = s
            dt = (time.perf_counter() - t0) / (args.calls * v["K"]) * 1e3
            line.append(f"{name}={dt:.3f}ms")
        print(f"pass {p}: " + "  ".join(line), flush=True)


if __name__ == "__main__":
    main()
