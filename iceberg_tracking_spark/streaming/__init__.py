from .windows import streaming_tumbling_agg, streaming_session_agg  # noqa: F401
from .tracker import streaming_track  # noqa: F401
