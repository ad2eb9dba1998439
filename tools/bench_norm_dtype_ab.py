"""Isolated A/Bs for the round-4 snapshot perf changes (VERDICT r4 #1a).

Runs the prod bench legs in ONE process (same relay session, back-to-back
— the ±0.05 p/s noise bound from BASELINE.md applies) across:

1. default         — im2col encoder + bf16 compute-dtype norms (shipped)
2. im2col_off      — the folded 5×5 conv executes as a convolution
                     (afgsa._IM2COL_MAX_PIXELS=0); attributes the im2col
                     rewrite (models/afgsa.py multi_scale_encode)
3. fp32_norms      — every norm on its bit-exact fp32 path
                     (layers._FORCE_FP32_NORM): the pre-snapshot numerics;
                     attributes the bf16 normalize paths
                     (RMSNormGated/LayerNormTorch/BatchNorm2d)

Results feed the BASELINE.md round-5 table.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from pixel_heal_thyself_tpu.models import afgsa as afgsa_mod
from pixel_heal_thyself_tpu.models import layers as layers_mod


def main() -> None:
    results = {}

    results["default_afgsa"] = round(bench._bench_afgsa(), 2)
    results["default_mamba"] = round(bench._bench_mamba(), 2)

    afgsa_mod._IM2COL_MAX_PIXELS = 0
    results["im2col_off_afgsa"] = round(bench._bench_afgsa(), 2)
    afgsa_mod._IM2COL_MAX_PIXELS = 256 * 256

    layers_mod._FORCE_FP32_NORM = True
    results["fp32_norms_afgsa"] = round(bench._bench_afgsa(), 2)
    results["fp32_norms_mamba"] = round(bench._bench_mamba(), 2)
    layers_mod._FORCE_FP32_NORM = False

    print(json.dumps(results))


if __name__ == "__main__":
    main()
