"""Full-frame tiled inference CLI.

Reconstructs the reference's out-of-repo inference flow (evidenced by
`tools/runs_inference_analysis.py:25,34-46`, which consumes per-EXR
`<scene>_<idx>_<spp>_evaluation.txt` files with `RMSE:`/`PSNR:`/`1-SSIM:`
fields — SURVEY.md §2.8/§5):

    python -m pixel_heal_thyself_tpu.inference -cn prod \
        trainer.model_path=<run>/model_epochN/state \
        inference.images_dir=data/images [inference.out_dir=...]

Frames are denoised in overlapping tiles (margin ≥ the network's receptive
field, multiple of the attention block so every tile satisfies the
8-divisibility constraint, reference `model.py:469-471`), batched through
the jitted generator, stitched by cropping the margins, and scored with
the training metrics (relative MSE in linear HDR; PSNR/SSIM on tone-mapped
uint8). Optionally writes the denoised EXR.

By default (`inference.fused=true`) the tiling, batching, and stitching
all run on-device inside one XLA program per frame
(`make_fused_frame_apply`): the frame crosses the host↔device link once
each way instead of shipping every overlapping window and paying a
dispatch round-trip per tile batch — measured 2.2× faster at 720p at the
training-parity tile-64/margin-32 geometry (9.35 → 4.19 s/frame,
BASELINE.md round-4 inference table). `inference.fused=false` restores
the host-loop path (useful for debugging individual tile batches);
`inference.spatial=true` instead shards whole frames across devices.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from pixel_heal_thyself_tpu.config import Config, ConfigRegistry, compose
from pixel_heal_thyself_tpu.config.run_dirs import register_run_dirs_resolver
from pixel_heal_thyself_tpu.data.exr import write_exr_groups
from pixel_heal_thyself_tpu.data.preprocessing import (
    postprocess_specular,
    preprocess_data,
    preprocess_normal,
    preprocess_specular,
)
from pixel_heal_thyself_tpu.logger import logger
from pixel_heal_thyself_tpu.metrics import (
    calculate_psnr,
    calculate_rmse,
    calculate_ssim,
)
from pixel_heal_thyself_tpu.utils.images import tensor2img

register_run_dirs_resolver()


def extract_tiles(x: np.ndarray, tile: int, margin: int) -> tuple[np.ndarray, tuple]:
    """Split [H, W, C] into overlapping (tile+2·margin)² tiles at stride
    `tile`, replicate-padding the frame edges. Returns (tiles, meta)."""
    h, w, c = x.shape
    ht = -(-h // tile)
    wt = -(-w // tile)
    ph, pw = ht * tile, wt * tile
    xp = np.pad(
        x,
        ((margin, margin + ph - h), (margin, margin + pw - w), (0, 0)),
        mode="edge",
    )
    size = tile + 2 * margin
    tiles = np.empty((ht * wt, size, size, c), np.float32)
    idx = 0
    for ty in range(ht):
        for tx in range(wt):
            y0, x0 = ty * tile, tx * tile
            tiles[idx] = xp[y0 : y0 + size, x0 : x0 + size]
            idx += 1
    return tiles, (h, w, ht, wt)


def stitch_tiles(tiles: np.ndarray, meta: tuple, tile: int, margin: int) -> np.ndarray:
    """Inverse of extract_tiles: crop margins and reassemble to [H, W, C]."""
    h, w, ht, wt = meta
    c = tiles.shape[-1]
    out = np.empty((ht * tile, wt * tile, c), np.float32)
    idx = 0
    for ty in range(ht):
        for tx in range(wt):
            out[
                ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile,
            ] = tiles[idx, margin : margin + tile, margin : margin + tile]
            idx += 1
    return out[:h, :w]


def denoise_frame(
    apply_fn,
    data: dict[str, np.ndarray],
    tile: int = 64,
    margin: int = 32,
    batch_tiles: int = 8,
) -> np.ndarray:
    """Denoise one preprocessed frame dict → linear-HDR output [H, W, 3].

    Default tile 64 + margin 32 gives 128² windows — the prod training
    patch geometry, so inference reuses the training compile-cache entry
    and fits the Pallas attention kernel's VMEM plan (320² windows at
    batch 8 were measured to exhaust v5e VMEM)."""
    noisy_log = preprocess_specular(data["noisy"]).astype(np.float32)
    aux = data["aux"].astype(np.float32).copy()
    aux[..., :3] = preprocess_normal(aux[..., :3])

    noisy_tiles, meta = extract_tiles(noisy_log, tile, margin)
    aux_tiles, _ = extract_tiles(aux, tile, margin)
    n = noisy_tiles.shape[0]
    pad_n = (-n) % batch_tiles
    if pad_n:
        # wrap-around repeat: covers pad_n > n (a frame with fewer tiles
        # than batch_tiles), which a plain `tiles[:pad_n]` under-pads —
        # the exported-artifact path then hard-fails on the baked batch
        reps = np.take(noisy_tiles, np.arange(pad_n) % n, axis=0)
        noisy_tiles = np.concatenate([noisy_tiles, reps], 0)
        aux_tiles = np.concatenate(
            [aux_tiles, np.take(aux_tiles, np.arange(pad_n) % n, axis=0)], 0,
        )

    # dispatch every batch before transferring any output: jax dispatch is
    # async, so this overlaps device compute with the host<->device copies
    # instead of stalling the device on one np.asarray per batch (measured
    # in tools/bench_inference.py). Peak footprint is all tile buffers at
    # once — an 8K frame at the default 4×-overlap geometry holds ~8.2k
    # 128² tiles × (10 input + 3 output) fp32 channels ≈ 7 GB, inside a
    # 16 GB v5e but not by much; prefer inference.fused for big frames
    # (one padded frame + one output resident instead of all windows).
    outs = []
    for i in range(0, len(noisy_tiles), batch_tiles):
        outs.append(
            apply_fn(
                jnp.asarray(noisy_tiles[i : i + batch_tiles]),
                jnp.asarray(aux_tiles[i : i + batch_tiles]),
            ),
        )
    out_tiles = np.concatenate(
        [np.asarray(o, np.float32) for o in outs], 0,
    )[:n]
    out_log = stitch_tiles(out_tiles, meta, tile, margin)
    return postprocess_specular(out_log)


def make_fused_frame_apply(
    apply_fn,
    frame_hw: tuple[int, int],
    tile: int = 64,
    margin: int = 32,
    batch_tiles: int = 8,
):
    """Build a jitted whole-frame denoiser: edge-pad, overlapping-window
    gather, batched model apply (`lax.scan` over tile batches), and
    margin-crop stitch all inside ONE XLA program.

    The host-loop path (`denoise_frame`) ships every overlapping window
    across the host↔device link and pays a dispatch round-trip per tile
    batch — at the default 4×-overlap geometry that is ~4× the frame's
    bytes in and one round-trip per 8 tiles. Here the frame crosses once
    in, once out, and the windowing/stitching lives on device where the
    copies are HBM-speed. Numerically identical to `denoise_frame` (same
    windows, same per-tile model inputs, same edge-replicate padding —
    only the wrap-around padding tiles are batched first instead of last;
    pinned by tests/test_inference.py).

    Returns `run(noisy_log [H,W,3] fp32, aux [H,W,C] fp32) -> [H,W,3]`
    operating in the model's log space — compiled per frame shape, so
    build once and reuse across equal-sized frames."""
    h, w = frame_hw
    size = tile + 2 * margin
    ht = -(-h // tile)
    wt = -(-w // tile)
    n = ht * wt
    pad_n = (-n) % batch_tiles
    coords = [(ty * tile, tx * tile) for ty in range(ht) for tx in range(wt)]
    # wrap-around repeat like denoise_frame — but scattered FIRST, so the
    # originals (scattered last) always win: even if a future model coupled
    # samples across the batch, padding could never overwrite real output
    # (the host path drops duplicates via [:n] for the same reason)
    coords = [coords[i % n] for i in range(pad_n)] + coords
    ys = jnp.asarray([c[0] for c in coords], jnp.int32).reshape(-1, batch_tiles)
    xs = jnp.asarray([c[1] for c in coords], jnp.int32).reshape(-1, batch_tiles)

    @jax.jit
    def run(noisy_log, aux):
        ph, pw = ht * tile - h, wt * tile - w
        pad = ((margin, margin + ph), (margin, margin + pw), (0, 0))
        noisy_p = jnp.pad(noisy_log, pad, mode="edge")
        aux_p = jnp.pad(aux, pad, mode="edge")

        def gather(img, y0, x0):
            return jax.lax.dynamic_slice(
                img, (y0, x0, 0), (size, size, img.shape[-1]),
            )

        def body(out, yx):
            yb, xb = yx
            tiles_n = jax.vmap(lambda y, x: gather(noisy_p, y, x))(yb, xb)
            tiles_a = jax.vmap(lambda y, x: gather(aux_p, y, x))(yb, xb)
            o = apply_fn(tiles_n, tiles_a)
            o = o[:, margin : margin + tile, margin : margin + tile, :]

            def scat(i, acc):
                return jax.lax.dynamic_update_slice(
                    acc, o[i].astype(acc.dtype), (yb[i], xb[i], 0),
                )

            return jax.lax.fori_loop(0, batch_tiles, scat, out), None

        out0 = jnp.zeros((ht * tile, wt * tile, noisy_log.shape[-1]), jnp.float32)
        out, _ = jax.lax.scan(body, out0, (ys, xs))
        return out[:h, :w]

    return run


def denoise_frame_fused(fused_apply, data: dict[str, np.ndarray]) -> np.ndarray:
    """`denoise_frame` semantics through a `make_fused_frame_apply`
    program: host does only the log-space pre/post transforms; one device
    dispatch per frame."""
    noisy_log = preprocess_specular(data["noisy"]).astype(np.float32)
    aux = data["aux"].astype(np.float32).copy()
    aux[..., :3] = preprocess_normal(aux[..., :3])
    out_log = np.asarray(
        fused_apply(jnp.asarray(noisy_log), jnp.asarray(aux)), np.float32,
    )
    return postprocess_specular(out_log)


def denoise_frame_spatial(
    sharded_apply,
    data: dict[str, np.ndarray],
    mesh,
    margin: int = 32,
) -> np.ndarray:
    """Denoise one frame with rows sharded over the mesh 'data' axis and
    halo exchange between neighbor devices (`parallel.spatial`).
    `sharded_apply` comes from `make_sharded_apply_rows` — built once per
    run so repeated frames of the same shape reuse the compiled program.
    Boundary semantics match `denoise_frame` (edge replication), so both
    paths produce the same output when margin covers the receptive
    field."""

    noisy_log = preprocess_specular(data["noisy"]).astype(np.float32)
    aux = data["aux"].astype(np.float32).copy()
    aux[..., :3] = preprocess_normal(aux[..., :3])

    n = mesh.shape["data"]
    h, w, _ = noisy_log.shape
    # rows: per-device strips must stay 8-divisible (block-attention grid
    # alignment); halo exchange supplies the vertical context. columns:
    # edge-replicate `margin` like the tiled path, so the model sees the
    # same horizontal border context both ways.
    step = 8 * n
    ph = (-h) % step
    strip = (h + ph) // n
    if strip < margin:
        # exchange_halo ships `margin` rows per neighbor; a shorter strip
        # would clip the exchange and silently lose vertical context (and
        # break the shard_map output spec) — small frames don't benefit
        # from row sharding anyway
        raise ValueError(
            f"spatial inference needs per-device row strips >= margin: "
            f"frame height {h} over {n} devices gives {strip}-row strips "
            f"< margin {margin}; lower inference.margin, use fewer "
            "devices, or drop inference.spatial for this frame size",
        )
    pw = (-w) % 8
    pad = ((0, ph), (margin, margin + pw), (0, 0))
    noisy_p = np.pad(noisy_log, pad, mode="edge")[None]
    aux_p = np.pad(aux, pad, mode="edge")[None]

    out = sharded_apply(jnp.asarray(noisy_p), jnp.asarray(aux_p))
    out_log = np.asarray(out, np.float32)[0, :h, margin : margin + w]
    return postprocess_specular(out_log)


def denoise_frame_sequence(
    seq_apply,
    data: dict[str, np.ndarray],
    n_devices: int,
) -> np.ndarray:
    """Denoise one frame with the raster-scan token sequence sharded over
    devices (`parallel.sequence.make_seq_sharded_apply`) — the Mamba
    full-frame path (VERDICT r2 "Promote Mamba to co-equal").

    When the frame height divides the device count this computes the
    EXACT unsharded full-frame result: convs exchange row halos, the SSD
    chains state across devices (pinned by tests/test_sequence_sharded.py).
    A non-divisible height is edge-padded up to a device multiple first;
    causality keeps the padded rows out of every real row's *scan* state,
    but the post-mixer 3×3 conv FFNs see the padded rows' computed
    activations instead of the unsharded model's boundary padding, so the
    bottom few real rows can deviate slightly from the unsharded result in
    that case."""
    noisy_log = preprocess_specular(data["noisy"]).astype(np.float32)
    aux = data["aux"].astype(np.float32).copy()
    aux[..., :3] = preprocess_normal(aux[..., :3])

    h = noisy_log.shape[0]
    ph = (-h) % n_devices
    pad = ((0, ph), (0, 0), (0, 0))
    noisy_p = np.pad(noisy_log, pad, mode="edge")[None]
    aux_p = np.pad(aux, pad, mode="edge")[None]
    out = seq_apply(jnp.asarray(noisy_p), jnp.asarray(aux_p))
    out_log = np.asarray(out, np.float32)[0, :h]
    return postprocess_specular(out_log)


def find_frame_pairs(images_dir: str | Path, noisy_spp: int, gt_spp: int):
    noisy_root = Path(images_dir) / f"{noisy_spp}spp"
    gt_root = Path(images_dir) / f"{gt_spp}spp"
    pairs = []
    for f in sorted(os.listdir(gt_root)):
        if not f.endswith(".exr"):
            continue
        # strip only the trailing `_<spp>.exr` — scene names may contain
        # underscores themselves
        stem = f[: -len(".exr")].rsplit("_", 1)[0]
        pairs.append(
            (
                stem,
                str(noisy_root / f"{stem}_{noisy_spp}"),
                str(gt_root / f"{stem}_{gt_spp}"),
            ),
        )
    return pairs


def load_generator(cfg: Config):
    """Build the generator from config and restore params from
    trainer.model_path (an Orbax checkpoint dir saved by the trainer)."""
    from pixel_heal_thyself_tpu.training import checkpoints
    from pixel_heal_thyself_tpu.training.trainer import AFGSATrainer, MambaTrainer

    if cfg.model.name == "afgsa":
        trainer_cls = AFGSATrainer
    elif cfg.model.name == "mamba":
        trainer_cls = MambaTrainer
    else:
        raise ValueError(f"Unsupported model: {cfg.model.name!r}")
    trainer = trainer_cls(cfg)
    model = trainer.create_generator()
    restored = checkpoints.restore_params(cfg.trainer.model_path)
    params = restored["g"]["params"] if "g" in restored else restored
    return model, {"params": params}


def run_inference(
    cfg: Config,
    images_dir: str,
    out_dir: str,
    tile: int = 64,
    margin: int = 32,
    batch_tiles: int = 8,
    noisy_spp: int = 32,
    gt_spp: int = 1024,
    save_exr: bool = False,
    scale: float = 1.0,
    spatial: bool = False,
    from_export: str | None = None,
    fused: bool = True,
) -> list[dict]:
    if from_export:
        # AOT serving artifact (tools/export_model.py): fixed tile window
        # and batch baked into the module — no model code or checkpoint
        from pixel_heal_thyself_tpu.serving import load_exported

        if spatial:
            raise ValueError(
                "inference.spatial shards the live flax model; exported "
                "artifacts serve the tiled path only",
            )
        apply_fn, manifest = load_exported(from_export)
        window = manifest["window"]
        if window != tile + 2 * margin:
            # honor the artifact's geometry: margin stays as configured
            # (receptive-field coverage), tile absorbs the difference
            new_tile = window - 2 * margin
            if new_tile <= 0:
                raise ValueError(
                    f"artifact window {window} can't cover margin {margin}; "
                    "lower inference.margin or re-export with a larger "
                    "export.window",
                )
            logger.info(
                f"[Infer] artifact window {window}: using tile {new_tile} "
                f"(+2×{margin} margin) instead of configured {tile}",
            )
            tile = new_tile
        if batch_tiles != manifest["batch_tiles"]:
            logger.info(
                f"[Infer] artifact batch_tiles {manifest['batch_tiles']} "
                f"overrides configured {batch_tiles}",
            )
            batch_tiles = manifest["batch_tiles"]
    else:
        model, variables = load_generator(cfg)
        apply_fn = jax.jit(lambda n, a: model.apply(variables, n, a))
    os.makedirs(out_dir, exist_ok=True)

    mesh = None
    sharded_apply = None
    seq_apply = None
    if spatial:
        from pixel_heal_thyself_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data_axis=len(jax.devices()), model_axis=1)
        # built once: same-shaped frames reuse the compiled program
        if cfg.model.name == "mamba":
            # Mamba's global raster scan has an unbounded receptive field —
            # halo-and-crop would be wrong; shard the token sequence with
            # exact cross-device state chaining instead
            from pixel_heal_thyself_tpu.parallel.sequence import (
                make_seq_sharded_apply,
            )

            seq_apply = make_seq_sharded_apply(model, variables, mesh)
            logger.info(
                f"[Infer] sequence sharding over {mesh.shape['data']} devices",
            )
        else:
            from pixel_heal_thyself_tpu.parallel.spatial import (
                make_sharded_apply_rows,
            )

            sharded_apply = make_sharded_apply_rows(
                lambda n, a: model.apply(variables, n, a), mesh, margin,
            )
            logger.info(
                f"[Infer] spatial sharding over {mesh.shape['data']} devices",
            )

    results = []
    fused_cache: dict[tuple[int, int], object] = {}
    for stem, noisy_path, gt_path in find_frame_pairs(images_dir, noisy_spp, gt_spp):
        start = time.time()
        data = preprocess_data(noisy_path, gt_path, scale=scale)
        if spatial and seq_apply is not None:
            out_lin = denoise_frame_sequence(
                seq_apply, data, mesh.shape["data"],
            )
        elif spatial:
            out_lin = denoise_frame_spatial(
                sharded_apply, data, mesh, margin=margin,
            )
        elif fused:
            hw = data["noisy"].shape[:2]
            if hw not in fused_cache:
                # compiled per frame shape; equal-sized frames reuse it
                fused_cache[hw] = make_fused_frame_apply(
                    apply_fn, hw, tile=tile, margin=margin,
                    batch_tiles=batch_tiles,
                )
            out_lin = denoise_frame_fused(fused_cache[hw], data)
        else:
            out_lin = denoise_frame(
                apply_fn, data, tile=tile, margin=margin, batch_tiles=batch_tiles,
            )
        gt_lin = data["gt"].astype(np.float64)

        rmse = calculate_rmse(out_lin.astype(np.float64), gt_lin)
        out_255 = tensor2img(out_lin)
        gt_255 = tensor2img(gt_lin)
        psnr = calculate_psnr(out_255, gt_255)
        ssim = calculate_ssim(out_255, gt_255)

        eval_path = Path(out_dir) / f"{stem}_{noisy_spp}_evaluation.txt"
        with open(eval_path, "w") as f:
            f.write(f"RMSE: {rmse:.6f}\nPSNR: {psnr:.4f}\n1-SSIM: {1 - ssim:.6f}\n")
        if save_exr:
            write_exr_groups(
                Path(out_dir) / f"{stem}_{noisy_spp}_denoised.exr",
                {"default": out_lin.astype(np.float32)},
                pixel_type="half",
            )
        logger.info(
            f"[Infer] {stem}: rmse={rmse:.6f} psnr={psnr:.2f} "
            f"1-ssim={1 - ssim:.4f} time={time.time() - start:.1f}s",
        )
        results.append({"scene": stem, "rmse": rmse, "psnr": psnr, "ssim": ssim})
    return results


def main(argv=None) -> None:
    from pixel_heal_thyself_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    parser = argparse.ArgumentParser(prog="pixel_heal_thyself_tpu.inference")
    parser.add_argument("-cn", "--config-name", default="default")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    # inference.* overrides are consumed here, the rest go to the config
    infer_opts = {"tile": 64, "margin": 32, "batch_tiles": 8, "save_exr": False,
                  "images_dir": None, "out_dir": None, "noisy_spp": 32,
                  "gt_spp": 1024, "spatial": False, "from_export": None,
                  "fused": True}
    cfg_overrides = []
    for ov in args.overrides:
        key, _, val = ov.partition("=")
        if key.startswith("inference."):
            name = key.split(".", 1)[1]
            cur = infer_opts.get(name)
            infer_opts[name] = (
                val.lower() in ("1", "true", "yes")
                if isinstance(cur, bool)
                else type(cur)(val) if cur is not None else val
            )
        else:
            cfg_overrides.append(ov)

    cfg = ConfigRegistry.create_config(compose(args.config_name, cfg_overrides))
    logger.setup_logger(cfg.logging.level)
    if not cfg.trainer.model_path and not infer_opts["from_export"]:
        raise SystemExit(
            "set trainer.model_path=<checkpoint state dir> "
            "(or inference.from_export=<artifact dir>)",
        )
    images_dir = infer_opts["images_dir"] or cfg.data.images.dir
    out_dir = infer_opts["out_dir"] or os.path.join(
        cfg.paths.output_dir, "inference",
    )
    run_inference(
        cfg,
        images_dir,
        out_dir,
        tile=infer_opts["tile"],
        margin=infer_opts["margin"],
        batch_tiles=infer_opts["batch_tiles"],
        noisy_spp=infer_opts["noisy_spp"],
        gt_spp=infer_opts["gt_spp"],
        save_exr=infer_opts["save_exr"],
        scale=cfg.data.images.scale,
        spatial=infer_opts["spatial"],
        from_export=infer_opts["from_export"],
        fused=infer_opts["fused"],
    )


if __name__ == "__main__":
    main(sys.argv[1:])
