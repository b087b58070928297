from .joins import grid_radius_join, consecutive_frame_join  # noqa: F401
from .windows import islands_longest_streak, mutual_argmax, top_k_per_group  # noqa: F401
