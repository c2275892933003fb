from .collapse import collapse_career  # noqa: F401
from .dictionary import build_series_dictionary, search_industries  # noqa: F401
from .extract import extract_proxy_dataset  # noqa: F401
from .grid import (  # noqa: F401
    collapse_duplicate_months,
    ensure_monthly_index,
    force_complete_month_grid,
)
