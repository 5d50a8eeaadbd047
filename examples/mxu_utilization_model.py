"""Analytic MXU-utilization model for the detector's conv stack.

PROFILE.md round 3 left the half-width (0.375) point's 68.6 eff TFLOPS vs
v5m's 112 unexplained, after refuting the HBM lane-padding hypothesis
(VERDICT r3 weak #6). This script quantifies the *compute-side* tiling
story instead: every conv lowers to an MXU matmul with contraction
K = kh*kw*C_in and output dim N = C_out, both padded to the MXU's 128-lane
tile (M = B*H*W is huge and never the problem). A conv with C_out=24 runs
the systolic array at 24/128 = 19% occupancy no matter how good XLA is.

For a given (width_mult, img) point it walks the ACTUAL jaxpr of the
detector forward (so the enumeration can't drift from the model code),
collects all conv_general_dilated shapes, and reports

  weighted_util = sum(flops_i) / sum(flops_i / util_i)

i.e. the eff-TFLOPS ceiling as a fraction of peak imposed purely by
lane padding, where util_i = (K/pad128(K)) * (N/pad128(N)).

This is the *model*; the measurement it pairs with is
examples/bench_detector_scale.py --raw-forward (queue job 48), whose
raw-forward eff TFLOPS should track weighted_util * peak if lane padding
is the explanation.

Run (CPU, instant): python examples/mxu_utilization_model.py
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _pad(n: int, m: int = 128) -> int:
    return max(m, math.ceil(n / m) * m)


def conv_shapes_from_jaxpr(width_mult: float, img: int, depth_mult: float = 0.34):
    """Enumerate every conv in the detector forward via its jaxpr."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cvsd_tpu.models.detector import PersonDetector

    model = PersonDetector(img_size=img, width_mult=width_mult,
                           depth_mult=depth_mult, num_keypoints=17)
    variables = model.init_variables(jax.random.PRNGKey(0))
    x = jnp.zeros((1, img, img, 3), jnp.float32)
    jaxpr = jax.make_jaxpr(lambda v, im: model.apply(v, im))(variables, x)

    convs = []

    def walk(jp):
        for eqn in jp.eqns:
            if eqn.primitive.name == "conv_general_dilated":
                lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
                out = eqn.outvars[0].aval
                # flax NHWC / HWIO / NHWC
                kh, kw, cin, cout = rhs.shape
                b, oh, ow, _ = out.shape
                convs.append(dict(kh=kh, kw=kw, cin=cin, cout=cout,
                                  oh=oh, ow=ow, b=b))
            for sub in eqn.params.values():
                if hasattr(sub, "jaxpr"):
                    walk(sub.jaxpr)
                elif isinstance(sub, (list, tuple)):
                    for s in sub:
                        if hasattr(s, "jaxpr"):
                            walk(s.jaxpr)

    walk(jaxpr.jaxpr)
    return convs


def analyze(convs):
    rows = []
    total_flops = 0.0
    total_padded = 0.0
    for c in convs:
        k = c["kh"] * c["kw"] * c["cin"]
        n = c["cout"]
        util = (k / _pad(k)) * (n / _pad(n))
        flops = 2.0 * c["b"] * c["oh"] * c["ow"] * k * n
        total_flops += flops
        total_padded += flops / util
        rows.append(dict(**c, K=k, N=n, util=util, gflops=flops / 1e9))
    return rows, total_flops / total_padded


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--depth-mult", type=float, default=0.67)
    ap.add_argument("--widths", default="0.75,0.375")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    report = {}
    for w in [float(x) for x in args.widths.split(",")]:
        convs = conv_shapes_from_jaxpr(w, args.img, args.depth_mult)
        rows, weighted = analyze(convs)
        # aggregate by (K,N) bucket for readability
        buckets = {}
        for r in rows:
            key = (r["K"], r["N"], r["util"])
            b = buckets.setdefault(key, dict(K=r["K"], N=r["N"],
                                             util=round(r["util"], 3),
                                             count=0, gflops=0.0))
            b["count"] += 1
            b["gflops"] += r["gflops"]
        bl = sorted(buckets.values(), key=lambda b: -b["gflops"])
        for b in bl:
            b["gflops"] = round(b["gflops"], 2)
        report[f"width_{w}"] = dict(
            img=args.img, depth_mult=args.depth_mult, num_convs=len(rows),
            total_gflops_b1=round(sum(r["gflops"] for r in rows), 2),
            lane_padding_util_ceiling=round(weighted, 4),
            buckets=bl[:12],
        )
        print(f"width {w}: {len(rows)} convs, "
              f"{report[f'width_{w}']['total_gflops_b1']} GFLOP/img, "
              f"lane-padding util ceiling = {weighted:.1%}")
        for b in bl[:8]:
            print(f"    K={b['K']:>5} N={b['N']:>4} util={b['util']:.2f} "
                  f"x{b['count']:<2} {b['gflops']:8.2f} GF")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
