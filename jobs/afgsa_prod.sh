#!/bin/bash
# Production training job — TPU-VM analog of reference talapas_jobs/afgsa_prod.sh
set -euo pipefail
cd "$(dirname "$0")/.."

python -m pixel_heal_thyself_tpu.train -cn prod \
    "$@" 2>&1 | python tools/termlog.py "outputs/prod_$(date +%Y%m%d_%H%M%S).log"
