from cvsd_tpu.models.gcae import GCAE, GCAEDecoder, GCAEEncoder, GraphConvolution, STGCNBlock, TemporalConvolution  # noqa: F401
from cvsd_tpu.models.graph import (  # noqa: F401
    adaptive_pool_matrix,
    compute_strides,
    get_skeleton_adjacency,
    normalize_adjacency,
    normalized_skeleton_adjacency,
)
from cvsd_tpu.models.detector import PersonDetector, build_detector, decode_predictions, make_detect_fn  # noqa: F401
from cvsd_tpu.models.shopformer import Shopformer, build_shopformer, count_parameters  # noqa: F401
from cvsd_tpu.models.transformer import (  # noqa: F401
    PositionalEncoding,
    ShopformerTransformer,
    TransformerDecoderLayer,
    TransformerEncoderLayer,
    build_transformer,
    sinusoidal_positional_encoding,
)
