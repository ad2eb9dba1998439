"""Run-directory resolver.

Parity with reference `pht/hydra/plugins/pht_run_dirs_resolver.py:14-118`:
single runs live in ``outputs/runs/<pattern>/runNNN`` (auto-increment or an
explicit ``run_num``); multirun/sweep jobs live in
``outputs/trials/runNNN/<job_subdir>``. A process-level singleton cache
makes repeated interpolations of the resolver return the same directory.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from pathlib import Path
from typing import Optional

from pixel_heal_thyself_tpu.config.loader import register_resolver
from pixel_heal_thyself_tpu.logger import logger
from pixel_heal_thyself_tpu.utils import (
    SingletonMeta,
    is_none_or_empty,
    is_truthy,
)


@dataclass
class RunDirsCache(metaclass=SingletonMeta):
    """Singleton caching the resolved run dir within one process."""

    is_multirun: Optional[bool] = None
    run_dir: Optional[Path] = None

    def reset(self) -> None:
        self.is_multirun = None
        self.run_dir = None


def pht_run_dirs_resolver(
    cfg_output_root_dir: str = "outputs",
    cfg_base_pattern: Optional[str] = None,
    cfg_job_subdir: Optional[str] = None,
    cfg_run_num: Optional[str] = "-1",
    cfg_is_multirun: Optional[str] = "False",
) -> str:
    """Create (as a side effect) and return the run directory path.

    Returns a path relative to the current working directory, exactly like
    the reference resolver (`pht_run_dirs_resolver.py:31-108`).
    """
    cache = RunDirsCache()
    cwd = Path.cwd()
    is_multirun = is_truthy(cfg_is_multirun)
    job_subdir = None if is_none_or_empty(cfg_job_subdir) else Path(str(cfg_job_subdir))
    base_pattern = (
        None if is_none_or_empty(cfg_base_pattern) else Path(str(cfg_base_pattern))
    )

    try:
        run_num = int(cfg_run_num)
    except Exception:
        run_num = -1

    if is_multirun and cache.is_multirun is None:
        cache.is_multirun = True

    if is_multirun:
        base_dir = cwd / str(cfg_output_root_dir) / "trials"
    else:
        if base_pattern is None:
            raise ValueError("base_pattern required for single-run directories")
        base_dir = cwd / str(cfg_output_root_dir) / "runs" / base_pattern
    base_dir.mkdir(parents=True, exist_ok=True)

    if run_num != -1:
        next_num = run_num
    else:
        highest = -1
        for item in base_dir.iterdir():
            m = re.match(r"run(\d+)", item.name)
            if m:
                highest = max(highest, int(m.group(1)))
        next_num = highest + 1

    run_dir: Path = base_dir / f"run{next_num:03d}"

    if not is_none_or_empty(cache.run_dir):
        run_dir = cache.run_dir
    else:
        run_dir.mkdir(parents=True, exist_ok=True)
        cache.run_dir = run_dir

    if not is_none_or_empty(job_subdir) and cache.is_multirun:
        run_dir = run_dir / job_subdir

    run_dir.mkdir(parents=True, exist_ok=True)
    run_dir_str = str(run_dir.relative_to(cwd))
    logger.info(f"Created run directory: {run_dir_str}")
    return run_dir_str


def register_run_dirs_resolver() -> None:
    """Register `${pht_run_dirs:...}` plus a `${cwd:}` helper resolver."""
    register_resolver("pht_run_dirs", pht_run_dirs_resolver)
    register_resolver("cwd", lambda: str(Path.cwd()))


def reset_run_dirs_cache() -> None:
    RunDirsCache().reset()
