"""Serve the anomaly scorer (+ optional detector) over HTTP.

    python -m cvsd_tpu.cli.serve --checkpoint stage2_best.msgpack \
        --detector_checkpoint det.msgpack --port 8470
"""

from __future__ import annotations

import argparse

from cvsd_tpu.cli.common import add_config_args


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    add_config_args(p)
    p.add_argument("--checkpoint", type=str, required=True, help="Shopformer checkpoint")
    p.add_argument("--detector_checkpoint", type=str, default=None,
                   help="enable /detect with this detector")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8470)
    args = p.parse_args(argv)

    from cvsd_tpu.config.config import apply_overrides
    from cvsd_tpu.eval.evaluate import load_model
    from cvsd_tpu.serve.server import ScoringServer

    scorer = load_model(args.checkpoint)
    cfg = apply_overrides(scorer.config, getattr(args, "overrides", []) or [])
    scorer.config = cfg
    detection = None
    if args.detector_checkpoint:
        from cvsd_tpu.cli.common import load_detector_cli
        from cvsd_tpu.pipeline.preprocess import DetectionPipeline

        variables, cfg = load_detector_cli(
            args.detector_checkpoint, cfg, getattr(args, "overrides", []) or [])
        detection = DetectionPipeline(cfg, variables=variables)
    ScoringServer(scorer, detection, host=args.host, port=args.port).serve_forever()


if __name__ == "__main__":
    main()
