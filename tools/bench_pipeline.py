"""Decompose the trainer-vs-bench throughput gap (VERDICT r3 #2).

bench.py times the device step on one RESIDENT batch (76.8 p/s round 4);
the real trainer epochs log ~51 p/s with io (time blocked in the loader)
only ~8% — so ~40 ms/step hides between "batch bytes already on chip" and
"batch arrives through the loader". This tool isolates the stages on the
real chip:

  resident     one device-resident batch, chained donated states — the
               bench.py pattern (upper bound; no input traffic)
  upload_sync  fresh host batch each step, `device_put` + block BEFORE
               the step dispatch — serializes the host→device copy (on
               axon: through the network relay) with compute
  upload_async fresh host batch each step, `device_put` issued one step
               AHEAD (the PrefetchLoader pattern) — measures whether the
               relay/runtime actually overlaps the upload with compute
  upload_eager like upload_async plus `block_until_ready` on the put in
               the "producer" position — forces the bytes to move at
               prefetch time if the runtime was deferring them
  upload_fused one device_put of a single packed [b,p,p,13] array per
               step (split into noisy/gt/aux inside the jit) instead of
               three puts — if the relay cost is per-transfer round-trip
               latency, this cuts it 3×
  upload_deep  like upload_async but with FOUR packed puts in flight —
               measures whether the relay pipelines concurrent
               transfers (the PrefetchLoader-with-depth pattern)
  resident_gather  the data/dataset.py:DeviceLoader pattern — the whole
               patch store lives in HBM, each step device_puts only a
               [b] int32 index array and gathers the batch on device;
               the fix the decomposition motivates

All batches are distinct random tensors (the axon relay dedupes identical
executions) and states chain through donation, the verified-sound timing
discipline (BASELINE.md round-3 sync-check).

Usage: python tools/bench_pipeline.py [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="bench_pipeline")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args(argv)

    from pixel_heal_thyself_tpu.utils.compilation_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pixel_heal_thyself_tpu.config import LossesConfig
    from pixel_heal_thyself_tpu.models.afgsa import AFGSANet
    from pixel_heal_thyself_tpu.models.discriminators import DiscriminatorVGG
    from pixel_heal_thyself_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    b, p = args.batch, 128
    use_pallas = jax.default_backend() not in ("cpu", "gpu")
    g_model = AFGSANet(dtype=jnp.bfloat16, use_pallas=use_pallas, num_gcp=0,
                     use_block_kernel=use_pallas)
    d_model = DiscriminatorVGG(input_size=p, dtype=jnp.bfloat16)
    g_tx = make_optimizer(1e-4, [2], 0.5, steps_per_epoch=100)
    d_tx = make_optimizer(1e-4, [2], 0.5, steps_per_epoch=100)

    noisy0 = jnp.zeros((b, p, p, 3))
    aux0 = jnp.zeros((b, p, p, 7))
    gstate = init_train_state(g_model, g_tx, jax.random.PRNGKey(0), noisy0, aux0)
    dstate = init_train_state(d_model, d_tx, jax.random.PRNGKey(1), noisy0)
    step_fn = make_train_step(g_model, d_model, LossesConfig(), False, g_tx, d_tx)
    rng = jax.random.PRNGKey(7)

    rng_np = np.random.default_rng(0)

    def host_batch() -> dict:
        return {
            "noisy": np.abs(rng_np.standard_normal((b, p, p, 3))).astype(np.float32),
            "gt": np.abs(rng_np.standard_normal((b, p, p, 3))).astype(np.float32),
            "aux": rng_np.standard_normal((b, p, p, 7)).astype(np.float32),
        }

    host_batches = [host_batch() for _ in range(args.iters + 2)]
    batch_mb = sum(a.nbytes for a in host_batches[0].values()) / 1e6

    def put(i: int):
        return {k: jax.device_put(v) for k, v in host_batches[i].items()}

    results: dict[str, float] = {}

    def record(tag: str, start: float, metrics) -> None:
        jax.block_until_ready(metrics["g_loss"])
        pps = b * args.iters / (time.perf_counter() - start)
        results[tag] = round(pps, 2)
        print(f"{tag:14s} {pps:7.2f} patches/sec", flush=True)

    # warm-up compile (shared executable across modes)
    gs, ds = gstate, dstate
    for _ in range(3):
        gs, ds, m = step_fn(gs, ds, put(0), rng)
    jax.block_until_ready(m["g_loss"])

    # resident: one device batch reused; states chain (donated)
    dev0 = put(0)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        gs, ds, m = step_fn(gs, ds, dev0, rng)
    record("resident", t0, m)

    # upload_sync: put + block, then dispatch — copy on the critical path
    t0 = time.perf_counter()
    for i in range(args.iters):
        db = put(i)
        jax.block_until_ready(db)
        gs, ds, m = step_fn(gs, ds, db, rng)
    record("upload_sync", t0, m)

    # upload_async: put issued one step ahead, never blocked on the host
    pending = put(0)
    t0 = time.perf_counter()
    for i in range(args.iters):
        nxt = put(i + 1)
        gs, ds, m = step_fn(gs, ds, pending, rng)
        pending = nxt
    record("upload_async", t0, m)

    # upload_eager: ahead AND forced to materialize at prefetch time
    pending = put(0)
    jax.block_until_ready(pending)
    t0 = time.perf_counter()
    for i in range(args.iters):
        nxt = put(i + 1)
        jax.block_until_ready(nxt)
        gs, ds, m = step_fn(gs, ds, pending, rng)
        pending = nxt
    record("upload_eager", t0, m)

    # ---- packed-wire variants: one transfer per step ---------------------
    packed = [
        np.concatenate([hb["noisy"], hb["gt"], hb["aux"]], axis=-1)
        for hb in host_batches
    ]

    def unpack(wire):
        return {"noisy": wire[..., :3], "gt": wire[..., 3:6], "aux": wire[..., 6:]}

    # jitted wrapper: the unpack slices trace into ONE executable with the
    # step (the inner jit inlines), so a step stays a single relay dispatch
    packed_step = jax.jit(
        lambda gs, ds, wire, rng: step_fn(gs, ds, unpack(wire), rng),
        donate_argnums=(0, 1),
    )

    # warm-up (the slices compile into the same executable's prologue)
    gs, ds, m = packed_step(gs, ds, jax.device_put(packed[0]), rng)
    jax.block_until_ready(m["g_loss"])

    # upload_fused: ONE put per step, issued one step ahead
    pending = jax.device_put(packed[0])
    jax.block_until_ready(pending)
    t0 = time.perf_counter()
    for i in range(args.iters):
        nxt = jax.device_put(packed[i + 1])
        jax.block_until_ready(nxt)
        gs, ds, m = packed_step(gs, ds, pending, rng)
        pending = nxt
    record("upload_fused", t0, m)

    # upload_deep: packed puts, FOUR in flight (prefetch-depth pattern)
    depth = 4
    packed_deep = packed + [packed[0]] * depth
    inflight = [jax.device_put(packed_deep[i]) for i in range(depth)]
    jax.block_until_ready(inflight)
    t0 = time.perf_counter()
    for i in range(args.iters):
        inflight.append(jax.device_put(packed_deep[i + depth]))
        gs, ds, m = packed_step(gs, ds, inflight.pop(0), rng)
    record("upload_deep", t0, m)

    # resident_gather: the DeviceLoader pattern — store in HBM, per-step
    # host traffic is one [b] int32 index array, batch gathered on device
    store = {
        k: jax.device_put(
            np.stack([hb[k] for hb in host_batches]).reshape(
                -1, *host_batches[0][k].shape[1:],
            ),
        )
        for k in host_batches[0]
    }
    jax.block_until_ready(store)
    n_store = args.batch * len(host_batches)
    gather = jax.jit(
        lambda st, idx: {k: jnp.take(v, idx, axis=0) for k, v in st.items()},
    )
    idx_rng = np.random.default_rng(3)
    all_idx = [
        idx_rng.integers(0, n_store, size=args.batch).astype(np.int32)
        for _ in range(args.iters + 1)
    ]
    gs, ds, m = step_fn(gs, ds, gather(store, jnp.asarray(all_idx[0])), rng)
    jax.block_until_ready(m["g_loss"])
    t0 = time.perf_counter()
    for i in range(args.iters):
        gs, ds, m = step_fn(gs, ds, gather(store, jnp.asarray(all_idx[i + 1])), rng)
    record("resident_gather", t0, m)

    results["batch_mb"] = round(batch_mb, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
