from .readers import (  # noqa: F401
    find_col,
    load_testdata,
    normalize_columns,
    read_csv,
    read_parquet,
    read_tsv,
    read_whitespace_tsv,
)
from .writers import write_csv_single, write_parquet  # noqa: F401
