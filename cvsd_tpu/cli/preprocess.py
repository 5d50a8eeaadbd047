"""UCF-Crime preprocessing: videos -> batched TPU person detection -> BBox CSVs.

Command surface parity with /root/reference/preprocess.py.

    python -m cvsd_tpu.cli.preprocess --dataset_dir dataset \
        --categories Shoplifting Shopping --limit 5
"""

from __future__ import annotations

import argparse
import json

from cvsd_tpu.cli.common import add_config_args, resolve_config


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_config_args(p)
    p.add_argument("--dataset_dir", type=str, default="dataset")
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--categories", nargs="*", default=["Shoplifting", "Shopping"])
    p.add_argument("--limit", type=int, default=None, help="max videos to process")
    p.add_argument("--detector_checkpoint", type=str, default=None,
                   help="msgpack with detector variables")
    args = p.parse_args(argv)
    cfg = resolve_config(args)

    variables = None
    if args.detector_checkpoint:
        from cvsd_tpu.cli.common import load_detector_cli

        variables, cfg = load_detector_cli(args.detector_checkpoint, cfg, args.overrides)

    from cvsd_tpu.cli.common import maybe_mesh
    from cvsd_tpu.pipeline.preprocess import preprocess_ucf_crime

    stats = preprocess_ucf_crime(cfg, args.dataset_dir, output_dir=args.output_dir,
                                 category_filter=args.categories, limit=args.limit,
                                 variables=variables, mesh_config=maybe_mesh(cfg))
    print(json.dumps(stats, indent=2, default=str))


if __name__ == "__main__":
    main()
