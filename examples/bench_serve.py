"""Serving endpoint throughput: micro-batched vs per-request dispatch.

Measures /score req/s with N concurrent HTTP clients against ScoringServer
in both modes (VERDICT r3 #6: one device dispatch per request caps the
server at ~1/RTT through the relay; the adaptive micro-batcher shares one
dispatch across concurrent requests). Prints a JSON summary.

Run: python examples/bench_serve.py [--clients 32] [--requests 384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--requests", type=int, default=384, help="total per mode")
    ap.add_argument("--windows-per-request", type=int, default=2)
    ap.add_argument("--out", default=None, help="write JSON summary here too")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    from cvsd_tpu.config import get_default_config
    from cvsd_tpu.eval.evaluate import ShopformerScorer
    from cvsd_tpu.models.shopformer import build_shopformer
    from cvsd_tpu.serve.server import ScoringServer

    print(f"backend={jax.default_backend()}")
    cfg = get_default_config()
    model = build_shopformer(cfg)
    scorer = ShopformerScorer(model, model.init_variables(jax.random.PRNGKey(0)), cfg)
    T = int(cfg["model"].get("seq_len", 12))
    V = int(cfg["model"].get("num_keypoints", 18))
    rng = np.random.default_rng(0)
    payloads = [json.dumps({"poses": rng.normal(
        size=(args.windows_per_request, T, V, 2)).tolist()}).encode()
        for _ in range(64)]

    import http.client
    import urllib.error

    retries = {"n": 0}

    def post(url, body):
        # Transient relay faults (CLAUDE.md: "remote_compile: response body
        # closed" killed a mid-train dispatch) can surface here as a 5xx or a
        # dropped connection; a 40-minute A/B must not die on one of them.
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "application/json"})
        for attempt in range(6):
            try:
                with urllib.request.urlopen(req, timeout=600) as r:
                    return json.loads(r.read())
            except (ConnectionResetError, ConnectionRefusedError,
                    http.client.RemoteDisconnected, TimeoutError,
                    urllib.error.URLError, urllib.error.HTTPError) as e:
                if isinstance(e, urllib.error.HTTPError) and e.code < 500:
                    raise
                if attempt == 5:
                    raise
                retries["n"] += 1
                print(f"post retry {attempt + 1}: {e!r}", flush=True)
                time.sleep(0.5 * (2 ** attempt))

    results = {}
    for mode, micro in (("per_request", False), ("microbatch", True)):
        srv = ScoringServer(scorer, port=0, microbatch=micro)
        srv.start()
        url = f"http://127.0.0.1:{srv.port}/score"
        try:
            # warmup: compile + steady relay
            with ThreadPoolExecutor(max_workers=args.clients) as ex:
                list(ex.map(lambda i: post(url, payloads[i % 64]),
                            range(args.clients * 2)))
            t0 = time.perf_counter()
            with ThreadPoolExecutor(max_workers=args.clients) as ex:
                out = list(ex.map(lambda i: post(url, payloads[i % 64]),
                                  range(args.requests)))
            dt = time.perf_counter() - t0
            assert all(len(o["scores"]) == args.windows_per_request for o in out)
            stats = (srv._score_mb.stats() if srv._score_mb is not None else {})
            results[mode] = {
                "req_per_sec": args.requests / dt, "seconds": dt,
                "clients": args.clients, "requests": args.requests,
                "items_per_batch": stats.get("items_per_batch"),
                "max_batch": stats.get("max_batch"),
                # per-mode delta, not the shared running total; note that a
                # retry after TimeoutError/URLError may re-submit a request
                # the server already processed, slightly inflating req/s
                "transport_retries": retries["n"] - retries.get("at_mode_start", 0),
                "retry_caveat": "timeout retries may double-submit",
            }
            retries["at_mode_start"] = retries["n"]
            print(f"{mode}: {results[mode]['req_per_sec']:.1f} req/s "
                  f"({dt:.2f}s for {args.requests}; "
                  f"items/batch={stats.get('items_per_batch')})", flush=True)
        finally:
            srv.stop()
    if results.get("per_request") and results.get("microbatch"):
        results["speedup"] = (results["microbatch"]["req_per_sec"]
                              / results["per_request"]["req_per_sec"])
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
