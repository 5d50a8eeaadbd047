"""Score pose sequences with a trained checkpoint.

Command surface parity with /root/reference/shopformer/inference.py.

    python -m cvsd_tpu.cli.inference --checkpoint ckpt/stage2_best.msgpack \
        --threshold 0.14 --output predictions.json
"""

from __future__ import annotations

import argparse

from cvsd_tpu.cli.common import add_config_args


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_config_args(p)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--threshold", type=float, default=None,
                   help="fixed score threshold (default: optimal on labels)")
    p.add_argument("--output", type=str, default=None, help="JSON output path")
    args = p.parse_args(argv)

    config = None
    if args.config or args.overrides or args.use_synthetic:
        from cvsd_tpu.cli.common import resolve_config

        config = resolve_config(args)

    from cvsd_tpu.infer.inference import run_inference

    result = run_inference(args.checkpoint, config=config,
                           threshold=args.threshold, output_path=args.output)
    m = result["metrics"]
    print(f"sequences={result['num_sequences']} threshold={result['threshold']:.4f} "
          f"auc_roc={m['auc_roc']:.4f} f1={m['f1']:.4f}")


if __name__ == "__main__":
    main()
