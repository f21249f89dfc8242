from .catalog import CATALOG, run_query  # noqa: F401
