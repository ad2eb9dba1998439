"""Resize every EXR under a tree to 50% (box filter), preserving channels.

Replaces the reference's oiiotool-based `tools/resize_exrs.sh` with the
framework's own EXR codec (no external image tools required).

Usage: python tools/resize_exrs.py [START_DIR] [--scale 0.5]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pixel_heal_thyself_tpu.data.exr import read_exr_channels, write_exr  # noqa: E402
from pixel_heal_thyself_tpu.data.preprocessing import scale_exr_img  # noqa: E402


def resize_exr(path: Path, scale: float) -> None:
    channels = read_exr_channels(path)
    scaled3 = scale_exr_img(
        {k: v[..., None] for k, v in channels.items()}, scale=scale,
    )
    write_exr(
        path,
        {k: v[..., 0] for k, v in scaled3.items()},
        compression="zip",
        pixel_type="half",
    )


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("start_dir", nargs="?", default=".")
    parser.add_argument("--scale", type=float, default=0.5)
    args = parser.parse_args()

    print(f"Starting to process EXR files in {args.start_dir}")
    for f in sorted(Path(args.start_dir).rglob("*.exr")):
        print(f"Processing {f}")
        try:
            resize_exr(f, args.scale)
            print(f"Successfully resized {f}")
        except Exception as e:
            print(f"Failed to resize {f}: {e}")
    print("All EXR files processed")


if __name__ == "__main__":
    main()
