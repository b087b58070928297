from .registry import QUERIES, QueryDef, query, get_queries, get_oracles  # noqa: F401
from . import queries_core  # noqa: F401  (registers)
from . import queries_advanced  # noqa: F401
from . import queries_llm  # noqa: F401
from . import queries_mot  # noqa: F401
from . import queries_ml  # noqa: F401
from . import queries_scale  # noqa: F401
from . import queries_curation  # noqa: F401
from . import queries_timeseries  # noqa: F401
from . import queries_graph  # noqa: F401
from . import queries_features  # noqa: F401
