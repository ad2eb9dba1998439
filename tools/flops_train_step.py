"""XLA cost-analysis FLOP counts for the full GAN train step.

Prints the compiled-step FLOPs per sample for either flagship model at
the bench.py configuration — the "work per sample" input to the
REF_A100_*_PATCHES_PER_SEC baseline derivations in BASELINE.md (the
reference publishes no numbers, so its A100 throughput is estimated as
achievable-TFLOP/s ÷ TFLOP/sample; see BASELINE.md "Derivation of
REF_A100_PATCHES_PER_SEC").

Also reports the G-forward-only and G-fwd+bwd FLOPs so the step split
(G vs D+GP vs optimizer) is visible.

Usage: python tools/flops_train_step.py [--model afgsa|mamba]
       (JAX_PLATFORMS=cpu works — FLOP counts are backend-independent
       up to fusion accounting; BASELINE.md records the TPU-compiled
       numbers)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="flops_train_step")
    ap.add_argument("--model", choices=("afgsa", "mamba"), default="afgsa")
    args = ap.parse_args(argv)

    from pixel_heal_thyself_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from pixel_heal_thyself_tpu.config import LossesConfig
    from pixel_heal_thyself_tpu.models.discriminators import DiscriminatorVGG
    from pixel_heal_thyself_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    p = 128
    use_pallas = jax.default_backend() not in ("cpu", "gpu")
    if args.model == "mamba":
        from pixel_heal_thyself_tpu.models.mamba import MambaDenoiserNet

        b = 4
        g = MambaDenoiserNet(dtype=jnp.bfloat16, num_gcp=0, height=p, width=p)
    else:
        from pixel_heal_thyself_tpu.models.afgsa import AFGSANet

        b = 8
        g = AFGSANet(dtype=jnp.bfloat16, use_pallas=use_pallas, num_gcp=0)
    d = DiscriminatorVGG(input_size=p, dtype=jnp.bfloat16)
    g_tx = make_optimizer(1e-4, [2], 0.5, steps_per_epoch=100)
    d_tx = make_optimizer(1e-4, [2], 0.5, steps_per_epoch=100)

    noisy0 = jnp.zeros((b, p, p, 3))
    aux0 = jnp.zeros((b, p, p, 7))
    gstate = init_train_state(g, g_tx, jax.random.PRNGKey(0), noisy0, aux0)
    dstate = init_train_state(d, d_tx, jax.random.PRNGKey(1), noisy0)
    step = make_train_step(g, d, LossesConfig(), False, g_tx, d_tx)

    batch = {"noisy": noisy0, "gt": noisy0, "aux": aux0}
    rng = jax.random.PRNGKey(7)

    def cost(fn, *a):
        return jax.jit(fn).lower(*a).compile().cost_analysis()["flops"]

    full = cost(step, gstate, dstate, batch, rng)

    def g_fwd(params, noisy, aux):
        return g.apply({"params": params}, noisy, aux)

    def g_fwd_bwd(params, noisy, aux, gt):
        def loss(pp):
            return jnp.mean(jnp.abs(g.apply({"params": pp}, noisy, aux) - gt))

        return jax.grad(loss)(params)

    fwd = cost(g_fwd, gstate.params, noisy0, aux0)
    fwdbwd = cost(g_fwd_bwd, gstate.params, noisy0, aux0, batch["gt"])

    print(
        json.dumps(
            {
                "model": args.model,
                "backend": jax.default_backend(),
                "batch": b,
                "patch": p,
                "full_step_tflop_per_sample": round(full / b / 1e12, 4),
                "g_fwd_tflop_per_sample": round(fwd / b / 1e12, 4),
                "g_fwd_bwd_tflop_per_sample": round(fwdbwd / b / 1e12, 4),
            },
        ),
    )


if __name__ == "__main__":
    main()
