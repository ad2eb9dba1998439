#!/bin/bash
# Production training job — TPU-VM analog of reference talapas_jobs/afgsa_prod.sh
set -euo pipefail
cd "$(dirname "$0")/.."

# gradient checkpointing off: the reference remats 3/5 blocks for a 24 GB
# GPU (model.py:661); prod activations fit TPU HBM, recompute is waste
python -m pixel_heal_thyself_tpu.train -cn prod \
    model.num_gradient_checkpoints=0 \
    "$@" 2>&1 | python tools/termlog.py "outputs/prod_$(date +%Y%m%d_%H%M%S).log"
