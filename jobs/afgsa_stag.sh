#!/bin/bash
# Staging training job — TPU-VM analog of reference talapas_jobs/afgsa_stag.sh
set -euo pipefail
cd "$(dirname "$0")/.."

python -m pixel_heal_thyself_tpu.train -cn stag \
    "$@" 2>&1 | python tools/termlog.py "outputs/stag_$(date +%Y%m%d_%H%M%S).log"
