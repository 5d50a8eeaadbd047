"""Train the Shopformer (two stages).

Command surface parity with /root/reference/shopformer/train.py (argparse
flags via --set overrides + --use_synthetic) and
/root/reference/shopformer_2/train.py (--config YAML, --stage, --checkpoint
resume).

    python -m cvsd_tpu.cli.train --config configs/paper.yaml
    python -m cvsd_tpu.cli.train --use_synthetic --set training.stage1_epochs=2
    python -m cvsd_tpu.cli.train --config c.yaml --stage 2 --checkpoint ckpt/stage1_best.msgpack
"""

from __future__ import annotations

import argparse

from cvsd_tpu.cli.common import add_config_args, maybe_mesh, resolve_config


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_config_args(p)
    p.add_argument("--stage", type=int, default=1, choices=(1, 2),
                   help="start stage (2 auto-loads stage1_best)")
    p.add_argument("--checkpoint", type=str, default=None, help="resume checkpoint")
    p.add_argument("--output_dir", type=str, default=None, help="checkpoint dir override")
    p.add_argument("--profile", type=str, default=None,
                   help="directory for a jax.profiler device trace of the run")
    args = p.parse_args(argv)

    cfg = resolve_config(args)
    if args.checkpoint and not args.config:
        # adopt the resume checkpoint's embedded MODEL architecture (e.g. an
        # imported reference checkpoint's ref-mirror knobs, cli.import_shopformer)
        # so the rebuilt model matches the weights; explicit --set model.*
        # flags still win
        from cvsd_tpu.config import apply_overrides
        from cvsd_tpu.utils.checkpoint import load_checkpoint

        _state, meta = load_checkpoint(args.checkpoint)
        emb = ((meta or {}).get("config") or {}).get("model")
        if emb:
            cfg = dict(cfg)
            cfg["model"] = {**cfg.get("model", {}), **emb}
            cfg = apply_overrides(
                cfg, [o for o in (getattr(args, "overrides", []) or [])
                      if o.startswith("model.")])
    if args.output_dir:
        cfg["experiment"]["checkpoint_dir"] = args.output_dir

    from cvsd_tpu.train.loop import train_from_config
    from cvsd_tpu.utils.logging import device_trace

    with device_trace(args.profile):
        train_from_config(cfg, mesh_config=maybe_mesh(cfg),
                          start_stage=args.stage, resume_checkpoint=args.checkpoint)


if __name__ == "__main__":
    main()
