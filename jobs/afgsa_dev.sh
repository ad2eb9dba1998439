#!/bin/bash
# Dev training job — TPU-VM analog of reference talapas_jobs/afgsa_dev.sh
# (SLURM single-GPU → single TPU host; multi-host runs set the usual
# jax.distributed env and the mesh picks up all devices automatically).
set -euo pipefail
cd "$(dirname "$0")/.."

python -m pixel_heal_thyself_tpu.train -cn dev \
    logging.level=DEBUG \
    "$@" 2>&1 | python tools/termlog.py "outputs/dev_$(date +%Y%m%d_%H%M%S).log"
