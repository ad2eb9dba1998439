#!/bin/bash
# Round-5 quality campaign (VERDICT r4 #5 + #1c).
#
# Legs:
#   1. Generate the noise_scale=0.5 synthetic channel ("clean05") — one
#      step cleaner than r4's 0.75 channel — plus matching held-out scenes.
#   2. AFGSA prod 12 epochs + Mamba stag 12 epochs on clean05 (target:
#      >=38 dB mean full-frame PSNR — the reference band's upper half).
#   3. Mamba stag 12 epochs on the r4 0.75 channel with CURRENT numerics —
#      the post-r4-campaign norm changes are proven quality-neutral by
#      comparing against the 096b9a8 table (36.69 dB final val PSNR).
#   4. Full-frame tiled inference over every scene incl. held-out, for
#      both models, both channels.
#   5. runs_analysis + runs_inference_analysis reports into
#      reports/r5_quality/.
#
# Run from anywhere; executes at the repo root on the real chip.
set -euo pipefail
cd "$(dirname "$0")/.."
ROOT=$PWD

python - <<'EOF'
from pixel_heal_thyself_tpu.data.synthetic import generate_dataset
train_scenes = [
    f"{fam}{i}_{j}" for fam in ("fftle", "taccturb")
    for i in range(2) for j in range(3)
][:10]
for d, scenes, ns, seed in (
    ("data/images_prod_synth_clean05", train_scenes, 0.5, 990819),
    ("data/images_heldout_synth_clean05", ["heldout0_0", "heldout1_0"], 0.5, 77),
    ("data/images_prod_synth_clean", train_scenes, 0.75, 990819),
    ("data/images_heldout_synth_clean", ["heldout0_0", "heldout1_0"], 0.75, 77),
):
    import os
    if not os.path.isdir(d):
        print("generating", d, flush=True)
        generate_dataset(d, scenes=scenes, height=512, width=512,
                         noise_scale=ns, seed=seed)
EOF

latest_run() {  # latest runNNN dir under outputs/runs/<pattern>
    ls -d outputs/runs/$1/run* | sort | tail -1
}
last_ckpt() {  # highest-epoch checkpoint state dir in a run dir
    ls -d "$1"/model_epoch* | sort -V | tail -1
}

# ---- leg 2a: AFGSA prod on clean05 ----------------------------------------
python -m pixel_heal_thyself_tpu.train -cn prod \
    model.num_gradient_checkpoints=0 \
    data.images.dir="$ROOT/data/images_prod_synth_clean05"
AFGSA_RUN=$(latest_run "afgsa_p128_n400_r1.0")
echo "AFGSA clean05 run: $AFGSA_RUN"

# ---- leg 2b: Mamba stag on clean05 ----------------------------------------
python -m pixel_heal_thyself_tpu.train -cn stag model=mamba \
    data.images.dir="$ROOT/data/images_prod_synth_clean05"
MAMBA_RUN=$(latest_run "mamba_p64_n200_r0.5")
echo "Mamba clean05 run: $MAMBA_RUN"

# ---- leg 3: Mamba stag on the r4 0.75 channel (norm-change A/B, #1c) ------
python -m pixel_heal_thyself_tpu.train -cn stag model=mamba \
    data.images.dir="$ROOT/data/images_prod_synth_clean"
MAMBA_R4_RUN=$(latest_run "mamba_p64_n200_r0.5")
echo "Mamba r4-channel re-run: $MAMBA_R4_RUN"

# ---- leg 4: full-frame inference ------------------------------------------
mkdir -p reports/r5_quality
for MODEL in afgsa mamba; do
    if [ "$MODEL" = afgsa ]; then RUN=$AFGSA_RUN; CN=prod; else RUN=$MAMBA_RUN; CN=stag; fi
    CKPT=$(last_ckpt "$RUN")/state
    for CH in images_prod_synth_clean05 images_heldout_synth_clean05; do
        python -m pixel_heal_thyself_tpu.inference -cn $CN \
            $([ "$MODEL" = mamba ] && echo model=mamba) \
            trainer.model_path="$CKPT" \
            inference.images_dir="$ROOT/data/$CH" \
            inference.out_dir="$ROOT/reports/r5_quality/$MODEL"
    done
done

# ---- leg 5: analysis reports ----------------------------------------------
python tools/runs_analysis.py outputs/runs \
    --output-dir reports/r5_quality/training_analysis || true
python tools/runs_inference_analysis.py \
    --baseline-dirs reports/r5_quality/afgsa \
    --variant mamba=reports/r5_quality/mamba \
    --output-dir reports/r5_quality/comparison

# stash the txt trajectories of the three runs for the report
for R in "$AFGSA_RUN" "$MAMBA_RUN" "$MAMBA_R4_RUN"; do
    TAG=$(basename "$(dirname "$R")")_$(basename "$R")
    cp "$R/train_loss.txt" "reports/r5_quality/${TAG}_train_loss.txt"
    cp "$R/evaluation.txt" "reports/r5_quality/${TAG}_evaluation.txt"
done
echo "r5 quality campaign complete"
