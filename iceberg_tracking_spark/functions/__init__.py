from .geometry import (  # noqa: F401
    box_area,
    box_corners,
    center_distance,
    containment_ratio,
    grid_cell,
    iou,
    size_similarity,
)
from .vectors import (  # noqa: F401
    cosine_similarity,
    dot_product,
    l2_norm,
    min_max_normalize,
    rescaled_cosine,
    weighted_score,
)
from .keys import composite_key, stable_id_hash, zero_pad  # noqa: F401
from .time import day_id, epoch_ms, frame_id  # noqa: F401
from .text import (  # noqa: F401
    char_ngrams,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    word_shingles,
)
