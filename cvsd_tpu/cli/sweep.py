"""Hyperparameter sweep over Shopformer configs.

Command surface parity with /root/reference/shopformer/sweep.py
(grid/random/recommended/quick modes, analysis report).

    python -m cvsd_tpu.cli.sweep --mode quick --output_dir sweeps/quick
    python -m cvsd_tpu.cli.sweep --mode random --num_configs 20
"""

from __future__ import annotations

import argparse
import json

from cvsd_tpu.cli.common import add_config_args


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_config_args(p)
    p.add_argument("--mode", choices=("grid", "random", "recommended", "quick"),
                   default="recommended")
    p.add_argument("--num_configs", type=int, default=20, help="random mode size")
    p.add_argument("--max_configs", type=int, default=None)
    p.add_argument("--output_dir", type=str, default="sweeps/run")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    base = None
    if args.config or args.overrides or args.use_synthetic:
        from cvsd_tpu.cli.common import resolve_config

        base = resolve_config(args)

    from cvsd_tpu.sweep.sweep import analyze_results, generate_configs, run_sweep

    configs = generate_configs(args.mode, base_config=base,
                               num_random=args.num_configs, seed=args.seed)
    results = run_sweep(configs, args.output_dir, verbose=True, max_configs=args.max_configs)
    print(json.dumps(analyze_results(results), indent=2, default=float))


if __name__ == "__main__":
    main()
