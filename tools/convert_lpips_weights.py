"""Convert pretrained VGG16 + LPIPS lin weights to the framework's npz.

The reference trains with `lpips.LPIPS(net="vgg")` (reference
`pht/models/base_trainer.py:144-148`): pretrained torchvision VGG16
features + the LPIPS v0.1 linear heads. This image has no egress, so the
weights must be fetched elsewhere; everything *after* the download is
automated here (torch-cpu is in this image — no torchvision/lpips
package needed with `--from-files`).

OPS RUNBOOK (the only human step is step 1):

1. Download the two artifacts (URLs in MANIFEST below):
       vgg16-397923af.pth      (torchvision VGG16 IMAGENET1K_V1)
       vgg.pth                 (LPIPS v0.1 vgg linear heads)
2. Verify them against the documented layout:
       python tools/convert_lpips_weights.py --verify vgg16-397923af.pth
       python tools/convert_lpips_weights.py --verify vgg.pth
3. Convert:
       python tools/convert_lpips_weights.py \
           --from-files vgg16-397923af.pth vgg.pth lpips_vgg.npz
4. Point the trainer at the npz:
       model.losses.use_lpips_loss=true
       model.losses.lpips_weights_path=lpips_vgg.npz

The legacy package path (needs torchvision + lpips installed) remains:
       python tools/convert_lpips_weights.py lpips_vgg.npz
"""

from __future__ import annotations

import argparse
import hashlib
import sys
from pathlib import Path

import numpy as np

# torchvision VGG16 feature-extractor conv indices → (out_ch, in_ch)
_VGG16_CONV_SHAPES = {
    0: (64, 3), 2: (64, 64),
    5: (128, 64), 7: (128, 128),
    10: (256, 128), 12: (256, 256), 14: (256, 256),
    17: (512, 256), 19: (512, 512), 21: (512, 512),
    24: (512, 512), 26: (512, 512), 28: (512, 512),
}
_LIN_CHANNELS = [64, 128, 256, 512, 512]

MANIFEST = {
    "vgg16": {
        "url": "https://download.pytorch.org/models/vgg16-397923af.pth",
        "filename": "vgg16-397923af.pth",
        # torchvision convention: the filename suffix is the first 8 hex
        # chars of the file's sha256 — checked by --verify. Record the
        # full digest printed by --verify after the first download.
        "sha256_prefix": "397923af",
        "tensors": {
            **{
                f"features.{i}.weight": (o, c, 3, 3)
                for i, (o, c) in _VGG16_CONV_SHAPES.items()
            },
            **{
                f"features.{i}.bias": (o,)
                for i, (o, _) in _VGG16_CONV_SHAPES.items()
            },
        },
        # classifier.* tensors are present in the artifact but unused here
        "ignore_prefixes": ("classifier.",),
    },
    "lpips_vgg_lin": {
        "url": (
            "https://github.com/richzhang/PerceptualSimilarity/raw/"
            "master/lpips/weights/v0.1/vgg.pth"
        ),
        "filename": "vgg.pth",
        "sha256_prefix": None,  # upstream publishes no hash; --verify prints one
        "tensors": {
            f"lin{k}.model.1.weight": (1, c, 1, 1)
            for k, c in enumerate(_LIN_CHANNELS)
        },
        "ignore_prefixes": (),
    },
    # the converted artifact this tool writes (also verifiable)
    "converted_npz": {
        "url": None,
        "filename": "lpips_vgg.npz",
        "sha256_prefix": None,
        "tensors": {
            **{
                f"features.{i}.weight": (o, c, 3, 3)
                for i, (o, c) in _VGG16_CONV_SHAPES.items()
            },
            **{
                f"features.{i}.bias": (o,)
                for i, (o, _) in _VGG16_CONV_SHAPES.items()
            },
            **{
                f"lin{k}.weight": (1, c, 1, 1)
                for k, c in enumerate(_LIN_CHANNELS)
            },
        },
        "ignore_prefixes": (),
    },
}


def _load_tensor_dict(path: Path) -> dict[str, np.ndarray]:
    """Load a .pth state dict (torch, cpu) or an .npz into name → array."""
    if path.suffix == ".npz":
        return dict(np.load(str(path)))
    import torch  # noqa: PLC0415 — torch-cpu is in this image

    state = torch.load(str(path), map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: v.detach().numpy() for k, v in state.items()}


def _match_manifest(tensors: dict[str, np.ndarray]):
    """Pick the MANIFEST entry whose inventory the file's names match."""
    names = set(tensors)
    for key, entry in MANIFEST.items():
        want = set(entry["tensors"])
        extra = {
            n for n in names - want
            if not n.startswith(entry["ignore_prefixes"] or ("\0",))
        }
        if want <= names and not extra:
            return key, entry
    return None, None


def verify(path: str) -> int:
    """Check a downloaded/converted artifact against the manifest.

    Returns 0 when the file matches a documented layout exactly (all
    expected tensor names present with the expected shapes, no
    unexplained extras, hash prefix matching where documented)."""
    p = Path(path)
    digest = hashlib.sha256(p.read_bytes()).hexdigest()
    print(f"{p.name}: sha256 {digest}")
    tensors = _load_tensor_dict(p)
    key, entry = _match_manifest(tensors)
    if entry is None:
        print("FAIL: tensor names match no documented artifact layout")
        for name in sorted(tensors)[:20]:
            print(f"  found: {name} {tuple(tensors[name].shape)}")
        return 1
    errors = []
    for name, shape in entry["tensors"].items():
        got = tuple(tensors[name].shape)
        if got != tuple(shape):
            errors.append(f"{name}: shape {got}, expected {tuple(shape)}")
    # hash check only for the canonically-named download (torchvision
    # embeds the sha256 prefix in the filename); renamed/re-saved copies
    # are still fully shape-verified above
    prefix = entry["sha256_prefix"]
    if prefix and p.name == entry["filename"] and not digest.startswith(prefix):
        errors.append(
            f"sha256 does not start with documented prefix {prefix}",
        )
    if errors:
        print(f"FAIL ({key}):")
        for e in errors:
            print(f"  {e}")
        return 1
    n = len(entry["tensors"])
    print(f"OK: matches '{key}' layout ({n} tensors, shapes verified)")
    return 0


def convert_from_files(vgg16_path: str, lpips_path: str, out_path: str) -> None:
    """Convert the two downloaded .pth artifacts — torch-cpu only."""
    vgg = _load_tensor_dict(Path(vgg16_path))
    lin = _load_tensor_dict(Path(lpips_path))
    for src, want_key in ((vgg, "vgg16"), (lin, "lpips_vgg_lin")):
        key, _ = _match_manifest(src)
        if key != want_key:
            raise SystemExit(
                f"input does not match the '{want_key}' layout "
                f"(matched: {key}); run --verify for details",
            )
    out: dict[str, np.ndarray] = {}
    for i in _VGG16_CONV_SHAPES:
        out[f"features.{i}.weight"] = vgg[f"features.{i}.weight"]
        out[f"features.{i}.bias"] = vgg[f"features.{i}.bias"]
    for k in range(5):
        out[f"lin{k}.weight"] = lin[f"lin{k}.model.1.weight"]
    np.savez(out_path, **out)
    print(f"wrote {out_path} ({len(out)} arrays)")


def convert_from_packages(out_path: str) -> None:
    """Legacy path: needs torchvision + lpips packages installed."""
    import lpips as lpips_pkg  # noqa: PLC0415
    import torch  # noqa: PLC0415
    from torchvision import models  # noqa: PLC0415

    vgg = models.vgg16(weights=models.VGG16_Weights.IMAGENET1K_V1)
    out: dict[str, np.ndarray] = {}
    for name, tensor in vgg.features.state_dict().items():
        out[f"features.{name}"] = tensor.numpy()

    net = lpips_pkg.LPIPS(net="vgg")
    with torch.no_grad():
        for k in range(5):
            lin = getattr(net, f"lin{k}")
            # lin weights are live Parameters (requires_grad) — detach
            # before numpy(); state_dict() tensors above come detached
            out[f"lin{k}.weight"] = lin.model[1].weight.detach().numpy()

    np.savez(out_path, **out)
    print(f"wrote {out_path} ({len(out)} arrays)")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="convert_lpips_weights")
    ap.add_argument(
        "--verify", metavar="FILE",
        help="check a downloaded .pth / converted .npz against the "
        "documented layout and print its sha256",
    )
    ap.add_argument(
        "--from-files", nargs=2, metavar=("VGG16_PTH", "LPIPS_VGG_PTH"),
        help="convert from the two downloaded artifacts (torch-cpu only)",
    )
    ap.add_argument("out", nargs="?", default="lpips_vgg.npz")
    args = ap.parse_args(argv)

    if args.verify:
        return verify(args.verify)
    if args.from_files:
        convert_from_files(args.from_files[0], args.from_files[1], args.out)
        return 0
    convert_from_packages(args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
