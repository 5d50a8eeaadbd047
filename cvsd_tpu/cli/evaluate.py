"""Evaluate a trained Shopformer checkpoint (frame- and video-level).

Command surface parity with /root/reference/shopformer/evaluate.py and
/root/reference/shopformer_2/evaluate.py.

    python -m cvsd_tpu.cli.evaluate --checkpoint ckpt/stage2_best.msgpack --output_dir evaluation
"""

from __future__ import annotations

import argparse
import json

from cvsd_tpu.cli.common import add_config_args


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_config_args(p)
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="evaluation")
    p.add_argument("--save_scores", action="store_true")
    args = p.parse_args(argv)

    config = None
    if args.config or args.overrides or args.use_synthetic:
        from cvsd_tpu.cli.common import resolve_config

        config = resolve_config(args)

    from cvsd_tpu.eval.evaluate import evaluate_checkpoint

    result = evaluate_checkpoint(args.checkpoint, config=config,
                                 output_dir=args.output_dir, save_scores=args.save_scores)
    print(json.dumps(result["test_metrics"], indent=2))
    if result.get("auc_delta_vs_recorded") is not None:
        print(f"AUC delta vs checkpoint-recorded: {result['auc_delta_vs_recorded']:+.4f}")


if __name__ == "__main__":
    main()
