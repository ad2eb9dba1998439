"""Export a trained denoiser checkpoint to a serving artifact.

    python tools/export_model.py -cn prod \
        trainer.model_path=<run>/model_epochN/state \
        export.out_dir=outputs/exports/afgsa_prod \
        [export.window=128] [export.batch_tiles=8] \
        [export.platforms=tpu | export.platforms=cpu,tpu]

Produces a `jax.export` StableHLO artifact (see
`pixel_heal_thyself_tpu/serving.py`) that `inference.py
inference.from_export=<dir>` — or any bare-jax serving process — can
load without the model code or checkpoint. The reference has no export
path at all (its inference flow was out-of-repo, SURVEY.md §2.8).

Multi-platform exports force the XLA attention path (Pallas Mosaic
custom calls are TPU-only); single-platform `tpu` exports keep whatever
kernel path the config/backend selects.
"""

from __future__ import annotations

import argparse
import sys

# keep repo-root execution working like the other tools
sys.path.insert(0, ".")

from pixel_heal_thyself_tpu.config import ConfigRegistry, compose  # noqa: E402
from pixel_heal_thyself_tpu.config.run_dirs import (  # noqa: E402
    register_run_dirs_resolver,
)
from pixel_heal_thyself_tpu.logger import logger  # noqa: E402


def main(argv=None) -> None:
    from pixel_heal_thyself_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    register_run_dirs_resolver()
    parser = argparse.ArgumentParser(prog="tools/export_model.py")
    parser.add_argument("-cn", "--config-name", default="default")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    export_opts = {
        "out_dir": None,
        "window": 128,
        "batch_tiles": 8,
        "platforms": None,  # default: the current backend
    }
    cfg_overrides = []
    for ov in args.overrides:
        key, _, val = ov.partition("=")
        if key.startswith("export."):
            name = key.split(".", 1)[1]
            if name not in export_opts:
                raise SystemExit(
                    f"unknown export option {key!r} "
                    f"(expected one of: {', '.join(sorted(export_opts))})",
                )
            cur = export_opts.get(name)
            export_opts[name] = type(cur)(val) if isinstance(cur, int) else val
        else:
            cfg_overrides.append(ov)

    cfg = ConfigRegistry.create_config(compose(args.config_name, cfg_overrides))
    logger.setup_logger(cfg.logging.level)
    if not cfg.trainer.model_path:
        raise SystemExit("set trainer.model_path=<checkpoint state dir>")
    if not export_opts["out_dir"]:
        raise SystemExit("set export.out_dir=<artifact dir>")

    import jax

    from pixel_heal_thyself_tpu.inference import load_generator
    from pixel_heal_thyself_tpu.serving import export_denoiser

    backend = jax.default_backend()
    platforms = (
        tuple(p.strip() for p in export_opts["platforms"].split(","))
        if export_opts["platforms"]
        else (("tpu",) if backend == "axon" else (backend,))
    )

    model, variables = load_generator(cfg)
    if len(platforms) > 1 and getattr(model, "use_pallas", False):
        # Mosaic custom calls only lower/execute on TPU; rebuild on the
        # portable XLA path for a multi-platform artifact
        logger.info(
            "[Export] multi-platform artifact: disabling the Pallas "
            "kernel path (TPU-only custom calls)",
        )
        portable = {"use_pallas": False}
        if hasattr(model, "fold_qkv"):
            portable["fold_qkv"] = False
        model = model.clone(**portable)

    out = export_denoiser(
        model,
        variables,
        export_opts["out_dir"],
        window=export_opts["window"],
        batch_tiles=export_opts["batch_tiles"],
        aux_channels=cfg.model.aux_input_channels,
        platforms=platforms,
        model_name=cfg.model.name,
        extra_meta={"config_name": args.config_name},
    )
    logger.info(f"[Export] wrote artifact to {out} (platforms={platforms})")


if __name__ == "__main__":
    main(sys.argv[1:])
