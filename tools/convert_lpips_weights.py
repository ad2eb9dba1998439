"""Convert torchvision VGG16 + lpips linear weights to the framework's npz.

Run on a machine with torchvision + lpips installed (this image has
neither and no egress):

    python tools/convert_lpips_weights.py lpips_vgg.npz

Then point the trainer at it:
    model.losses.use_lpips_loss=true
    model.losses.lpips_weights_path=lpips_vgg.npz
"""

from __future__ import annotations

import sys

import numpy as np


def main(out_path: str) -> None:
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


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_vgg.npz")
