from .readers import load_tables, read_csv, read_fixture, validate_dataframe
from .writers import write_bucketed_table, write_parquet

__all__ = [
    "load_tables",
    "read_csv",
    "read_fixture",
    "validate_dataframe",
    "write_bucketed_table",
    "write_parquet",
]
