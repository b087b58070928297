from .tables import load_table, load_tables, register_views  # noqa: F401
from .mot import read_mot_csv, write_mot_csv  # noqa: F401
