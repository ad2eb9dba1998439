"""Training CLI: `python -m pixel_heal_thyself_tpu.train -cn {ci,dev,stag,prod} [k=v ...]`.

Preserves the reference's entry surface (reference `pht/train.py:16-38`
via Hydra): `-cn/--config-name` selects the env config, positional
`key=value` arguments override any config path, `model=mamba` switches the
model group, `-m/--multirun` sweeps comma-separated override values.
"""

from __future__ import annotations

import argparse
import itertools
import sys
from pathlib import Path

import yaml

from pixel_heal_thyself_tpu.config import Config, ConfigRegistry, compose
from pixel_heal_thyself_tpu.config.run_dirs import (
    register_run_dirs_resolver,
    reset_run_dirs_cache,
)
from pixel_heal_thyself_tpu.logger import logger

register_run_dirs_resolver()


def _build_trainer(cfg: Config):
    from pixel_heal_thyself_tpu.training.trainer import AFGSATrainer, MambaTrainer

    if cfg.model.name == "afgsa":
        return AFGSATrainer(cfg)
    if cfg.model.name == "mamba":
        return MambaTrainer(cfg)
    raise ValueError(f"Unsupported model: {cfg.model.name}")


def _save_run_metadata(cfg_tree: dict, overrides: list[str]) -> None:
    """Persist composed config + overrides like Hydra's .hydra dir
    (consumed by tools/runs_analysis.py, reference `runs_analysis.py:29-59`)."""
    out_dir = Path(cfg_tree["paths"]["output_dir"]) / ".hydra"
    out_dir.mkdir(parents=True, exist_ok=True)
    with open(out_dir / "overrides.yaml", "w") as f:
        yaml.safe_dump(overrides, f)
    with open(out_dir / "config.yaml", "w") as f:
        yaml.safe_dump(cfg_tree, f, sort_keys=False)


def run_single(config_name: str, overrides: list[str]) -> None:
    cfg_tree = compose(config_name, overrides)
    cfg = ConfigRegistry.create_config(cfg_tree)
    logger.setup_logger(cfg.logging.level)
    _save_run_metadata(cfg_tree, overrides)
    trainer = _build_trainer(cfg)
    trainer.train()


def _expand_multirun(overrides: list[str]) -> list[list[str]]:
    """Expand comma-separated override values into a sweep grid."""
    choices = []
    for ov in overrides:
        key, _, val = ov.partition("=")
        vals = val.split(",") if "," in val else [val]
        choices.append([f"{key}={v}" for v in vals])
    return [list(combo) for combo in itertools.product(*choices)]


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(prog="pixel_heal_thyself_tpu.train")
    parser.add_argument("-cn", "--config-name", default="default")
    parser.add_argument("-m", "--multirun", action="store_true")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    from pixel_heal_thyself_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()  # single runs AND every -m sweep job

    if not args.multirun:
        run_single(args.config_name, args.overrides)
        return

    from pixel_heal_thyself_tpu.config.run_dirs import pht_run_dirs_resolver

    jobs = _expand_multirun(args.overrides)
    trial_cache_primed = False
    for job_overrides in jobs:
        if not trial_cache_primed:
            reset_run_dirs_cache()
            trial_cache_primed = True  # all sweep jobs share one trial run
        subdir = ",".join(job_overrides) or "job"
        logger.info(f"[multirun] job: {subdir}")
        # jobs land in outputs/trials/<runNNN>/<subdir> (reference
        # default.yaml:34-36 sweep layout); the dir is computed here and
        # passed as a literal so override values may contain commas
        out_dir = pht_run_dirs_resolver("outputs", "none", subdir, "-1", "true")
        cfg_tree = compose(
            args.config_name,
            job_overrides + [f"paths.output_dir={out_dir}"],
        )
        cfg = ConfigRegistry.create_config(cfg_tree)
        logger.setup_logger(cfg.logging.level)
        _save_run_metadata(cfg_tree, job_overrides)
        _build_trainer(cfg).train()


if __name__ == "__main__":
    main(sys.argv[1:])
