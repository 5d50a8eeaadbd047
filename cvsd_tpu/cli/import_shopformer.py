"""Import a reference-trained Shopformer torch checkpoint.

Converts the reference's `best_model.pt` / `final_model.pt` (v1,
shopformer/train.py:524-636) or `stage2_best.pt` (v2, shopformer_2/
train.py:372-426) into a framework checkpoint consumable by cli.evaluate,
cli.inference, cli.stream and cli.annotate — the Shopformer counterpart of
cli.import_yolo. Eval-mode numerics match torch (tests/
test_shopformer_import.py).

    python -m cvsd_tpu.cli.import_shopformer --torch_checkpoint best_model.pt \
        --variant v1 --kpts 17 --output shopformer.msgpack
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch_checkpoint", required=True)
    p.add_argument("--output", required=True, help="output .msgpack path")
    p.add_argument("--variant", choices=["v1", "v2"], default=None,
                   help="reference generation (default: from embedded config, else v2)")
    p.add_argument("--kpts", type=int, default=None,
                   help="keypoints (v1 default 17, v2 default 18)")
    p.add_argument("--seq_len", type=int, default=12)
    p.add_argument("--num_tokens", type=int, default=2)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--latent", type=int, default=8)
    p.add_argument("--heads", type=int, default=2)
    p.add_argument("--ff", type=int, default=64)
    p.add_argument("--d_model", type=int, default=None,
                   help="transformer width when != latent*kpts (adds projections)")
    p.add_argument("--unsafe", action="store_true",
                   help="allow full torch unpickling (executes code from the "
                        "file) when weights_only=True loading fails; only for "
                        "trusted checkpoints")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from cvsd_tpu.utils.checkpoint import save_checkpoint
    from cvsd_tpu.utils.shopformer_import import (import_shopformer_checkpoint,
                                                  reference_model_config)

    model_cfg = None
    if args.variant is not None:
        kpts = args.kpts if args.kpts is not None else (17 if args.variant == "v1" else 18)
        model_cfg = reference_model_config(
            args.variant, num_keypoints=kpts, seq_len=args.seq_len,
            num_tokens=args.num_tokens, hidden_channels=args.hidden,
            latent_channels=args.latent, num_heads=args.heads,
            dim_feedforward=args.ff, d_model=args.d_model)
    model, variables, config = import_shopformer_checkpoint(
        args.torch_checkpoint, model_cfg=model_cfg, variant=args.variant,
        allow_unsafe_load=args.unsafe)

    # smoke: one eval-mode scoring pass before persisting
    poses = np.zeros((2, model.seq_len, model.num_keypoints, model.in_channels),
                     np.float32)
    scores = np.asarray(model.apply(variables, poses,
                                    method="compute_anomaly_score"))
    assert np.isfinite(scores).all()

    save_checkpoint(args.output, jax.device_get(variables), config=config,
                    source=args.torch_checkpoint)
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"imported {args.torch_checkpoint} ({config['model']['variant']}) "
          f"-> {args.output} ({n:,} params)")


if __name__ == "__main__":
    main()
