"""Diagnose the 96-122k seq/s Shopformer scoring variance (RESULTS.md).

Hypotheses: (a) relay round-trip jitter, (b) silent recompiles, (c) host-side
stacking/upload cost. Design:

- ONE process, one compiled scoring program (jax_log_compiles surfaces any
  recompile), device-resident input (no host stacking in the timed loop).
- N trials of the bench.py pattern (chain K dispatches device-side, fetch one
  scalar). Per-trial throughput isolates (a): with a fixed program and fixed
  data, any spread is dispatch/relay scheduling, not the model.
- A second pass times EACH chained segment separately (one sync per segment)
  to expose the round-trip latency distribution directly.
- A third pass re-uploads the input every trial to price (c).

Run (real TPU): python examples/bench_scorer_variance.py [--trials 10]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--chain", type=int, default=4, help="dispatches chained per trial")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_log_compiles", True)
    compile_events = []

    class _H(logging.Handler):
        def emit(self, record):
            compile_events.append(record.getMessage()[:120])

    logging.getLogger("jax._src.interpreters.pxla").addHandler(_H())
    logging.getLogger("jax._src.dispatch").addHandler(_H())

    import jax.numpy as jnp

    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.models.shopformer import build_shopformer

    cfg = get_default_config()
    sf = build_shopformer(cfg)
    sf_vars = sf.init_variables(jax.random.PRNGKey(0))
    score = jax.jit(lambda v, x: sf.apply(v, x, method="compute_anomaly_score"))
    SB = args.batch
    rng = np.random.default_rng(0)
    poses_host = rng.normal(size=(SB, 12, 18, 2)).astype(np.float32)
    poses = jnp.asarray(poses_host)
    float(jnp.sum(score(sf_vars, poses)))  # compile
    n_compiles_at_warmup = len(compile_events)

    # pass 1: chained trials (the RESULTS.md measurement, repeated)
    chained = []
    for _ in range(args.trials):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _i in range(args.chain):
            acc = acc + jnp.sum(score(sf_vars, poses))
        float(acc)
        chained.append(SB * args.chain / (time.perf_counter() - t0))

    # pass 2: per-dispatch round-trip latency (sync every dispatch)
    rtts = []
    for _ in range(args.trials * args.chain):
        t0 = time.perf_counter()
        float(jnp.sum(score(sf_vars, poses)))
        rtts.append(1000 * (time.perf_counter() - t0))

    # pass 3: re-upload input each trial (host stacking + transfer priced in)
    upload = []
    for _ in range(args.trials):
        t0 = time.perf_counter()
        acc = jnp.float32(0)
        for _i in range(args.chain):
            p = jnp.asarray(poses_host)  # fresh upload
            acc = acc + jnp.sum(score(sf_vars, p))
        float(acc)
        upload.append(SB * args.chain / (time.perf_counter() - t0))

    recompiles = len(compile_events) - n_compiles_at_warmup
    arr = np.asarray(chained)
    up = np.asarray(upload)
    r = np.asarray(rtts)
    print(json.dumps({
        "backend": jax.default_backend(),
        "chained_kseq_s": {"mean": round(arr.mean() / 1e3, 1), "min": round(arr.min() / 1e3, 1),
                           "max": round(arr.max() / 1e3, 1), "cv_pct": round(100 * arr.std() / arr.mean(), 1)},
        "reupload_kseq_s": {"mean": round(up.mean() / 1e3, 1), "min": round(up.min() / 1e3, 1),
                            "max": round(up.max() / 1e3, 1)},
        "per_dispatch_rtt_ms": {"p10": round(float(np.percentile(r, 10)), 1),
                                "p50": round(float(np.percentile(r, 50)), 1),
                                "p90": round(float(np.percentile(r, 90)), 1),
                                "max": round(float(r.max()), 1)},
        "recompiles_after_warmup": recompiles,
        "trials": args.trials, "chain": args.chain, "batch": SB,
    }, ))
    if recompiles:
        print("compile events:", compile_events[n_compiles_at_warmup:][:5])


if __name__ == "__main__":
    main()
