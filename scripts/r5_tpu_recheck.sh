#!/bin/bash
# Round-5 post-s2d TPU measurement chain — fire once when the tunnel is
# back. Single chip: jobs run serially. Each is bounded; a failure does
# not stop the chain.
set -x
cd "$(dirname "$0")/.."
mkdir -p results/profiles

# 1. ResNet-trunk s2d A/B (the queued decision: flip trunk_stem default?)
timeout 1800 python scripts/ab_bench.py --passes 5 --calls 4 \
    --variants-json '{
      "trunk_conv": {"method": "ANP", "task": "shapenet_3d",
                     "img_agg": "reshape", "tasks_per_batch": 20,
                     "max_ctx_num": 15, "query_num": 15, "dim_w": null,
                     "gen_bg": true, "steps_per_call": 16},
      "trunk_s2d":  {"method": "ANP", "task": "shapenet_3d",
                     "img_agg": "reshape", "tasks_per_batch": 20,
                     "max_ctx_num": 15, "query_num": 15, "dim_w": null,
                     "gen_bg": true, "steps_per_call": 16,
                     "trunk_stem": "s2d"}}' \
    > results/profiles/trunk_s2d_ab.log 2>&1

# 2. Headline sanity with the landed literature-stem s2d default
timeout 1800 env BENCH_FAST=1 python bench.py \
    > results/profiles/bench_fast_post_s2d.log 2>&1

# 2b. s2dp (phase-pool folded into the stem) A/B vs the landed s2d, on the
#     exact-aug headline and the MAML T20 production config
timeout 1800 python scripts/ab_bench.py --passes 5 --calls 4 \
    --variants-json '{
      "exact_s2d":  {},
      "exact_s2dp": {"stem_impl": "s2dp"},
      "maml_t20_s2d":  {"method": "MAMLShapeNet1D", "aug_list": ["data_aug"],
                        "agg_mode": null, "dim_w": 196, "num_filters": 64,
                        "num_updates": 5, "test_num_updates": 20,
                        "first_order": false, "update_lr": 0.002,
                        "beta": 0.001, "lr": 5e-4, "steps_per_call": 4,
                        "tasks_per_batch": 20},
      "maml_t20_s2dp": {"method": "MAMLShapeNet1D", "aug_list": ["data_aug"],
                        "agg_mode": null, "dim_w": 196, "num_filters": 64,
                        "num_updates": 5, "test_num_updates": 20,
                        "first_order": false, "update_lr": 0.002,
                        "beta": 0.001, "lr": 5e-4, "steps_per_call": 4,
                        "tasks_per_batch": 20, "stem_impl": "s2dp"}}' \
    > results/profiles/s2dp_ab.log 2>&1

# 3. MAML batch re-sweep: the s2d stem changed the cost balance (+81% at
#    T20); confirm T20 is still the optimum
timeout 1500 python scripts/maml_batch_sweep.py maml \
    --batches 10,20,40 --rounds 3 --calls 2 \
    > results/profiles/maml_batch_resweep.log 2>&1

# 4. Fresh roofline captures of the s2d-stem programs
timeout 900 python scripts/roofline.py exact --calls 8 \
    > results/profiles/roofline_exact_s2d.log 2>&1
timeout 900 python scripts/roofline.py maml --calls 8 \
    > results/profiles/roofline_maml_s2d.log 2>&1

echo RECHECK_DONE
