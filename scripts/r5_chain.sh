#!/bin/bash
# Round-5 serial TPU job chain (single chip — jobs must not contend).
# Each job is bounded; a failure does not stop the chain.
set -x
cd "$(dirname "$0")/.."

timeout 1500 python scripts/maml_batch_sweep.py both \
    --batches 10,20,40,80 --rounds 3 --calls 2 \
    > results/profiles/maml_batch_sweep.log 2>&1

timeout 4200 python scripts/fcl_sweep.py --iters 20000 --out fcl_sweep.json \
    > results/profiles/fcl_sweep.log 2>&1

timeout 2400 python scripts/anpmr_beta_sweep.py --iters 20000 \
    > results/profiles/anpmr_beta_sweep.log 2>&1

timeout 900 python scripts/roofline.py exact --calls 8 \
    > results/profiles/roofline_exact.log 2>&1
timeout 900 python scripts/roofline.py perf --calls 8 \
    > results/profiles/roofline_perf.log 2>&1
timeout 900 python scripts/roofline.py maml --calls 8 \
    > results/profiles/roofline_maml.log 2>&1
echo CHAIN_DONE
