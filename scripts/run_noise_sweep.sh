#!/bin/bash
# VERDICT r3 task 1: LM-fusion accuracy noise sweep (serialized TPU jobs).
# Trainings use the device-resident epoch scan (tunnel-free).
set -x
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/bench_data/.jax_cache
# A0: round-3 params re-eval at native sigma 0.12 (per-read data + gates)
python scripts/train_accuracy_run.py --skip-train \
  --threshold-sweep --result-name accuracy_s012_eval.json \
  > bench_data/trained/sweep_s012eval.log 2>&1
# A: round-3 params, eval at sigma 0.18 (mismatch opens the gate)
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
