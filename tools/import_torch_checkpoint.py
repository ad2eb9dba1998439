"""Import trained PyTorch-reference checkpoints into this framework.

The reference saves per-epoch `torch.save(model.state_dict(), ".../G.pt")`
(and `D.pt`; reference `pht/models/base_trainer.py:487-533`). This tool
converts those state_dicts into this framework's flax param trees and
writes a params-only Orbax checkpoint that `inference.py`
(`trainer.model_path=<out>`) and `tools/export_model.py` consume directly
— so a user migrating from the reference keeps their trained models, not
just their configs (MIGRATION.md "Checkpoints").

Covered mappings (each key is the reference module's state_dict name):
- AFGSANet G (`pht/models/afgsa/model.py:585-733`): encoder/decoder conv
  blocks, per-transformer-block attention (q/k/v 1×1 convs, fused conv_map,
  rel_h/rel_w embeddings, optional FiLM) and feed-forward convs. The
  curve_indices/inv_curve_indices buffers are dropped: the curve
  permutation is a numerical no-op (see ops/attention_pallas.py) and this
  framework takes the ordering from config, not the checkpoint.
- MambaDenoiserNet G (`pht/models/mamba/model.py:101-238`): the same
  encoder/decoder skeleton plus per-block LayerNorm, `mamba_ssm.Mamba2`
  weights (in_proj/conv1d/dt_bias/A_log/D/gated-norm/out_proj — the layout
  the torch-oracle tests pin, tests/test_mamba_oracle.py) and feed-forward
  convs. The `pos_encoder.pe` buffer is dropped (deterministic; recomputed).
- DiscriminatorVGG D (`pht/models/afgsa/model.py:264-344`): conv/BN stages
  and the classifier Linears. BatchNorm running stats are dropped (this
  framework's BatchNorm2d is per-batch, matching how the reference's D is
  only ever run in training mode); the flatten order is corrected from the
  reference's NCHW (C·H·W) to NHWC (H·W·C) for the first Linear.

Weight layout transforms: torch Conv2d [Co,Ci,kh,kw] → flax [kh,kw,Ci,Co];
torch Linear [out,in] → flax Dense [in,out]; mamba conv1d [C,1,k] → [k,C].

Checkpointed-block naming: the last `num_gcp` transformer/mamba blocks live
under `Checkpoint*Block_i` in the flax tree (nn.remat renames the module
class), so `--num-gcp` must match the target model config (it does not
change any weight, only tree paths).

Usage:
  python tools/import_torch_checkpoint.py --model afgsa \
      --g /path/G.pt --out /path/imported_g [--num-gcp 2] [--use-film]
  python tools/import_torch_checkpoint.py --model mamba --g G.pt --out DIR
  python tools/import_torch_checkpoint.py --model discriminator_vgg \
      --g D.pt --out DIR
Then:
  python -m pixel_heal_thyself_tpu.inference trainer.model_path=DIR ...

Validated end-to-end in tests/test_torch_import.py: the actual reference
`AFGSANet`/`DiscriminatorVGG` modules (imported from the reference tree)
are random-initialized, saved, converted, and their forward outputs
compared against this framework's models to fp32 tolerance.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _conv_w(w: np.ndarray) -> np.ndarray:
    """torch Conv2d [Co, Ci, kh, kw] → flax Conv [kh, kw, Ci, Co]."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _set(tree: dict, path: str, value: np.ndarray) -> None:
    node = tree
    parts = path.split("/")
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = np.asarray(value, np.float32)


_ENCODER_DECODER = {
    # shared AFGSANet / MambaDenoiserNet skeleton (reference afgsa
    # model.py:605-657 / mamba model.py:120-172, decoder :189-215 / :694-733)
    "conv1": "ConvBlock_0",
    "conv3": "ConvBlock_1",
    "conv5": "ConvBlock_2",
    "conv_map": "ConvBlock_3",
    "conv_a1": "ConvBlock_4",
    "conv_a3": "ConvBlock_5",
    "conv_a5": "ConvBlock_6",
    "conv_aenc1": "ConvBlock_7",
    "conv_aenc2": "ConvBlock_8",
    "decoder.0": "ConvBlock_9",
    "decoder.1": "ConvBlock_10",
    "decoder.2": "ConvBlock_11",
}

_DROPPED = re.compile(
    # curve buffers: numerical no-op; pos_encoder.pe: deterministic;
    # BN running stats: this framework's BN is per-batch (see module
    # docstring); attention.alpha: dead parameter in the reference — its
    # only use is a commented-out blend (reference model.py:459)
    r"\.(curve_indices|inv_curve_indices)$|^pos_encoder\.pe$"
    r"|\.(running_mean|running_var|num_batches_tracked)$"
    r"|\.attention\.alpha$",
)


def _block_name(i: int, num_blocks: int, num_gcp: int, kind: str) -> str:
    """Reference checkpoints the LAST num_gcp blocks (model.py:661-663,
    mamba model.py:176); flax nn.remat prefixes those class names."""
    plain = num_blocks - num_gcp
    if i < plain:
        return f"{kind}Block_{i}"
    return f"Checkpoint{kind}Block_{i - plain}"


def convert_afgsa_generator(
    sd: dict, num_gcp: int = 2, use_film: bool = False,
) -> dict:
    """Reference AFGSANet state_dict → flax param tree (shape/value map;
    weights untouched beyond layout transposes)."""
    blocks = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"transformer_blocks\.(\d+)\.", k))
        },
    )
    num_sa = len(blocks)
    params: dict = {}
    handled = set()

    for tk, fk in _ENCODER_DECODER.items():
        _set(params, f"{fk}/Conv_0/kernel", _conv_w(sd[f"{tk}.0.weight"]))
        _set(params, f"{fk}/Conv_0/bias", sd[f"{tk}.0.bias"])
        handled |= {f"{tk}.0.weight", f"{tk}.0.bias"}

    for i in blocks:
        t = f"transformer_blocks.{i}"
        f = _block_name(i, num_sa, num_gcp, "Transformer")
        if not use_film:
            # film replaces the noisy+aux fusion conv (model.py:439-449)
            _set(params, f"{f}/attention/ConvBlock_0/Conv_0/kernel",
                 _conv_w(sd[f"{t}.attention.conv_map.0.weight"]))
            _set(params, f"{f}/attention/ConvBlock_0/Conv_0/bias",
                 sd[f"{t}.attention.conv_map.0.bias"])
        for proj in ("q_conv", "k_conv", "v_conv"):
            _set(params, f"{f}/attention/{proj}/kernel",
                 _conv_w(sd[f"{t}.attention.{proj}.weight"]))
        # rel_h [1, win, 1, half] / rel_w [1, 1, win, half] → [win, half]
        # (reference model.py:447-455 vs models/afgsa.py rel params)
        win_h = sd[f"{t}.attention.rel_h"]
        win_w = sd[f"{t}.attention.rel_w"]
        _set(params, f"{f}/attention/rel_h", win_h.reshape(win_h.shape[1], -1))
        _set(params, f"{f}/attention/rel_w", win_w.reshape(win_w.shape[2], -1))
        if use_film:
            _set(params, f"{f}/attention/FiLM_0/Conv_0/kernel",
                 _conv_w(sd[f"{t}.attention.film.affine.0.weight"]))
            _set(params, f"{f}/attention/FiLM_0/Conv_0/bias",
                 sd[f"{t}.attention.film.affine.0.bias"])
            _set(params, f"{f}/attention/FiLM_0/Conv_1/kernel",
                 _conv_w(sd[f"{t}.attention.film.affine.2.weight"]))
            _set(params, f"{f}/attention/FiLM_0/Conv_1/bias",
                 sd[f"{t}.attention.film.affine.2.bias"])
        for ff_t, ff_f in (("feed_forward.0.0", "ConvBlock_0"),
                           ("feed_forward.1.0", "ConvBlock_1")):
            _set(params, f"{f}/{ff_f}/Conv_0/kernel",
                 _conv_w(sd[f"{t}.{ff_t}.weight"]))
            _set(params, f"{f}/{ff_f}/Conv_0/bias", sd[f"{t}.{ff_t}.bias"])
        handled |= {k for k in sd if k.startswith(t + ".")}

    _check_leftovers(sd, handled)
    return params


def convert_mamba_generator(sd: dict, num_gcp: int = 2) -> dict:
    """Reference MambaDenoiserNet state_dict → flax param tree."""
    blocks = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"mamba_blocks\.(\d+)\.", k))
        },
    )
    num_blocks = len(blocks)
    params: dict = {}
    handled = set()

    for tk, fk in _ENCODER_DECODER.items():
        _set(params, f"{fk}/Conv_0/kernel", _conv_w(sd[f"{tk}.0.weight"]))
        _set(params, f"{fk}/Conv_0/bias", sd[f"{tk}.0.bias"])
        handled |= {f"{tk}.0.weight", f"{tk}.0.bias"}

    for i in blocks:
        t = f"mamba_blocks.{i}"
        f = _block_name(i, num_blocks, num_gcp, "Mamba")
        _set(params, f"{f}/norm1/scale", sd[f"{t}.norm1.weight"])
        _set(params, f"{f}/norm1/bias", sd[f"{t}.norm1.bias"])
        # mamba_ssm.Mamba2 weights (the layout tests/test_mamba_oracle.py
        # pins): Linear [out,in] → Dense kernel [in,out]; depthwise conv1d
        # [C,1,k] → [k,C]
        _set(params, f"{f}/mamba/in_proj/kernel",
             sd[f"{t}.mamba.in_proj.weight"].T)
        _set(params, f"{f}/mamba/conv1d_weight",
             np.squeeze(sd[f"{t}.mamba.conv1d.weight"], axis=1).T)
        _set(params, f"{f}/mamba/conv1d_bias", sd[f"{t}.mamba.conv1d.bias"])
        _set(params, f"{f}/mamba/dt_bias", sd[f"{t}.mamba.dt_bias"])
        _set(params, f"{f}/mamba/A_log", sd[f"{t}.mamba.A_log"])
        _set(params, f"{f}/mamba/D", sd[f"{t}.mamba.D"])
        _set(params, f"{f}/mamba/norm/weight", sd[f"{t}.mamba.norm.weight"])
        _set(params, f"{f}/mamba/out_proj/kernel",
             sd[f"{t}.mamba.out_proj.weight"].T)
        for ff_t, ff_f in (("feed_forward.0.0", "ConvBlock_0"),
                           ("feed_forward.1.0", "ConvBlock_1")):
            _set(params, f"{f}/{ff_f}/Conv_0/kernel",
                 _conv_w(sd[f"{t}.{ff_t}.weight"]))
            _set(params, f"{f}/{ff_f}/Conv_0/bias", sd[f"{t}.{ff_t}.bias"])
        handled |= {k for k in sd if k.startswith(t + ".")}

    _check_leftovers(sd, handled)
    return params


def convert_discriminator_vgg(sd: dict) -> dict:
    """Reference DiscriminatorVGG state_dict → flax param tree.

    The classifier's first Linear sees a flattened feature map: NCHW
    (C·H·W order) in the reference, NHWC (H·W·C) here — its input axis is
    permuted accordingly. The final spatial size is always 4×4 by
    construction (log2(input/4) stride-2 stages; reference model.py:318).
    """
    stages = sorted(
        {
            int(m.group(1))
            for k in sd
            if (m := re.match(r"features\.(\d+)\.", k))
        },
    )
    params: dict = {}
    handled = set()
    for i in stages:
        _set(params, f"ConvBlock_{i}/Conv_0/kernel",
             _conv_w(sd[f"features.{i}.0.weight"]))
        _set(params, f"ConvBlock_{i}/Conv_0/bias", sd[f"features.{i}.0.bias"])
        handled |= {f"features.{i}.0.weight", f"features.{i}.0.bias"}
        if f"features.{i}.1.weight" in sd:  # BatchNorm stage
            _set(params, f"ConvBlock_{i}/BatchNorm2d_0/scale",
                 sd[f"features.{i}.1.weight"])
            _set(params, f"ConvBlock_{i}/BatchNorm2d_0/bias",
                 sd[f"features.{i}.1.bias"])
            handled |= {f"features.{i}.1.weight", f"features.{i}.1.bias"}

    w = sd["classifier.0.weight"]  # [100, C·4·4] in (C, H, W) order
    ch = w.shape[1] // 16
    w_nhwc = (
        w.reshape(w.shape[0], ch, 4, 4).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
    )
    _set(params, "Dense_0/kernel", w_nhwc.T)
    _set(params, "Dense_0/bias", sd["classifier.0.bias"])
    _set(params, "Dense_1/kernel", sd["classifier.2.weight"].T)
    _set(params, "Dense_1/bias", sd["classifier.2.bias"])
    handled |= {
        "classifier.0.weight", "classifier.0.bias",
        "classifier.2.weight", "classifier.2.bias",
    }
    _check_leftovers(sd, handled)
    return params


def _check_leftovers(sd: dict, handled: set) -> None:
    leftovers = [k for k in sd if k not in handled and not _DROPPED.search(k)]
    if leftovers:
        raise KeyError(
            f"unmapped reference state_dict keys (unsupported variant?): "
            f"{sorted(leftovers)[:8]}{'…' if len(leftovers) > 8 else ''}",
        )


_CONVERTERS = {
    "afgsa": convert_afgsa_generator,
    "mamba": convert_mamba_generator,
    "discriminator_vgg": convert_discriminator_vgg,
}


def load_state_dict(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: np.asarray(v.detach().numpy(), np.float32) for k, v in sd.items()}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--model", choices=sorted(_CONVERTERS), required=True)
    ap.add_argument("--g", required=True, help="path to the reference .pt state_dict")
    ap.add_argument("--out", required=True, help="Orbax params checkpoint dir to write")
    ap.add_argument("--num-gcp", type=int, default=2,
                    help="gradient-checkpointed blocks in the target config "
                         "(naming only; must match the model config)")
    ap.add_argument("--use-film", action="store_true",
                    help="the checkpoint was trained with model.use_film=true")
    args = ap.parse_args()

    sd = load_state_dict(args.g)
    if args.model == "afgsa":
        params = convert_afgsa_generator(sd, args.num_gcp, args.use_film)
    elif args.model == "mamba":
        params = convert_mamba_generator(sd, args.num_gcp)
    else:
        params = convert_discriminator_vgg(sd)

    from pixel_heal_thyself_tpu.training import checkpoints

    checkpoints.save_params(args.out, params)
    n = sum(x.size for x in jax_leaves(params))
    print(f"imported {len(sd)} reference tensors -> {args.out} ({n:,} params)")


def jax_leaves(tree):
    import jax

    return jax.tree.leaves(tree)


if __name__ == "__main__":
    main()
