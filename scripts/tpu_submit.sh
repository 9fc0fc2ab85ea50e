#!/bin/bash
# TPU-pod launcher — the reference's slurm_submit analogue for TPU VMs.
# Usage: tpu_submit.sh <script.sh> [args...]
# On a multi-host TPU slice run this once per host (e.g. with
# `gcloud compute tpus tpu-vm ssh --worker=all --command=...`); JAX
# initialises jax.distributed from the TPU runtime environment
# automatically. Single-host slices (v5e-8) need no extra setup.
set -e
export JAX_PLATFORMS="${JAX_PLATFORMS:-tpu}"
# compilation cache makes restarts cheap (core/cache.py also sets this)
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$HOME/.cache/jax_comp}"
exec "$@"
