from .etl_pipeline import run_etl  # noqa: F401
