from cvsd_tpu.eval.evaluate import (  # noqa: F401
    ShopformerScorer,
    evaluate_checkpoint,
    evaluate_frame_level,
    evaluate_video_level,
    load_model,
)
