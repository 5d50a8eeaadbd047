from cvsd_tpu.ops.iou import box_iou_matrix, xywh_to_xyxy, xyxy_to_xywh, xyxy_to_xywhn  # noqa: F401
from cvsd_tpu.ops.letterbox import letterbox_batch, letterbox_params  # noqa: F401
from cvsd_tpu.ops.nms import (  # noqa: F401
    batched_nms,
    nms_fixpoint_jax,
    nms_jax,
    nms_pallas,
    nms_pallas_fixpoint,
)
