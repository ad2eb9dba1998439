"""Per-program XLA compiler options from the environment.

`PHT_XLA_OPTS="flag=value,flag2=value2"` injects TPU compiler options
into the jitted train step via `jax.jit(..., compiler_options=...)`.

Why not `XLA_FLAGS`: on axon-relayed TPUs the client process links a
CPU-only XLA whose flag parser aborts on libtpu-only flags (measured:
`--xla_tpu_scoped_vmem_limit_kib` is "Unknown flag" client-side), while
per-jit compiler options travel inside the compile request and are
validated and applied by the server's TPU compiler (a bogus option name
errors server-side — verified). This is a perf-tuning escape hatch; the
defaults ship empty.
"""

from __future__ import annotations

import os

ENV_VAR = "PHT_XLA_OPTS"


def env_compiler_options() -> dict[str, str] | None:
    """Parse PHT_XLA_OPTS → a jax.jit compiler_options dict (or None)."""
    raw = os.environ.get(ENV_VAR, "").strip()
    if not raw:
        return None
    opts: dict[str, str] = {}
    for item in raw.split(","):
        item = item.strip()
        if not item:
            continue
        key, sep, val = item.partition("=")
        if not sep or not key:
            raise ValueError(
                f"{ENV_VAR} entries must be flag=value, got {item!r}",
            )
        opts[key.strip().lstrip("-")] = val.strip()
    return opts or None
