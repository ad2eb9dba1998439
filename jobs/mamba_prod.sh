#!/bin/bash
# Mamba2 production training job
set -euo pipefail
cd "$(dirname "$0")/.."

python -m pixel_heal_thyself_tpu.train -cn prod model=mamba \
    "$@" 2>&1 | python tools/termlog.py "outputs/mamba_prod_$(date +%Y%m%d_%H%M%S).log"
