"""Image conversion / saving utilities.

Behavioral spec: reference `pht/models/afgsa/util.py:77-211` — tone
mapping (gamma 1/2.2), tensor→uint8 image with optional specular/diffuse
post-processing, 1×3 validation PNG panels, and mkdir-with-suffix. Arrays
here are HWC / NHWC (TPU-native layout) where the reference used CHW.
"""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from pixel_heal_thyself_tpu.data.preprocessing import (  # noqa: E402
    postprocess_diffuse,
    postprocess_specular,
)


def tone_mapping(matrix: np.ndarray, gamma: float = 2.2) -> np.ndarray:
    # negatives clamp to 0 *before* the fractional power — the reference
    # (`util.py:73-74`) powered first, producing NaNs for early-training
    # negative radiance that then cast to undefined uint8 values
    return np.clip(np.maximum(matrix, 0.0) ** (1.0 / gamma), 0, 1)


def tensor2img(
    image_numpy: np.ndarray,
    post_spec: bool = False,
    post_diff: bool = False,
    albedo: np.ndarray | None = None,
) -> np.ndarray:
    """HWC (or NHWC) float → tone-mapped uint8 [0,255]."""
    if post_diff and albedo is None:
        raise ValueError("must provide albedo when post_diff is True")
    if image_numpy.ndim == 4:
        return np.array(
            [
                tensor2img(
                    im,
                    post_spec=post_spec and not post_diff,
                    post_diff=post_diff,
                    albedo=albedo[i] if post_diff else None,
                )
                for i, im in enumerate(image_numpy)
            ],
        )
    img = np.asarray(image_numpy, np.float64)
    if post_spec:
        img = postprocess_specular(img)
    elif post_diff:
        img = postprocess_diffuse(img, albedo)
    img = tone_mapping(img) * 255.0
    return np.clip(img, 0, 255).astype(np.uint8)


def save_img_group(
    save_path: str,
    index: int,
    noisy: np.ndarray,
    output: np.ndarray,
    y: np.ndarray,
) -> None:
    """1×3 Noisy/Output/Reference panel PNG (reference util.py:153-181)."""
    name = os.path.join(save_path, f"{index}.png")
    if noisy.ndim == 4:
        noisy, output, y = noisy[0], output[0], y[0]
    fig = plt.figure()
    for i, (img, title) in enumerate(
        [(noisy, "Noisy"), (output, "Output"), (y, "Reference")], start=1,
    ):
        ax = fig.add_subplot(1, 3, i)
        ax.axis("off")
        ax.imshow(img)
        ax.set_title(title)
    fig.savefig(name, bbox_inches="tight")
    plt.close(fig)


def create_folder(path: str, still_create: bool = False) -> str:
    """mkdir; with `still_create`, append _N until a fresh name is found."""
    if not os.path.exists(path):
        os.makedirs(path)
        return path
    if still_create:
        count = 1
        while True:
            candidate = f"{path}_{count}"
            if not os.path.exists(candidate):
                os.makedirs(candidate)
                return candidate
            count += 1
    return path
