#!/bin/bash
# VERDICT r3 task 1: LM-fusion accuracy noise sweep (serialized TPU jobs).
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/bench_data/.jax_cache
# A: round-3 params (trained at 0.12), eval at sigma 0.18 (signal-model
# mismatch opens the gate) + threshold sweep
python scripts/train_accuracy_run.py --skip-train --eval-noise 0.18 \
  --threshold-sweep --result-name accuracy_evalnoise018.json \
  > bench_data/trained/sweep_evalnoise018.log 2>&1
# B: train AND eval at sigma 0.18
python scripts/train_accuracy_run.py --noise 0.18 --threshold-sweep \
  --out bench_data/trained/s018 \
  > bench_data/trained/sweep_s018.log 2>&1
# C: train AND eval at sigma 0.25
python scripts/train_accuracy_run.py --noise 0.25 --threshold-sweep \
  --out bench_data/trained/s025 \
  > bench_data/trained/sweep_s025.log 2>&1
echo SWEEP_DONE
