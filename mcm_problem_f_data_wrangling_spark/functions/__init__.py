from .cleaning import strip_keys, to_double_coerce, to_int_coerce  # noqa: F401
from .datefn import (  # noqa: F401
    future_month_index,
    make_month_date,
    month_end,
    month_start,
    synthesize_date,
)
from .predicates import (  # noqa: F401
    ci_contains,
    code_matches,
    is_monthly_period,
    naics_mask,
)
from .rolling import (  # noqa: F401
    cumulative_sum,
    diff,
    index_rebase,
    pct_change,
    rolling_avg,
    rolling_corr,
    rolling_median,
    rolling_std,
    seasonal_diff,
    series_window,
    tail_slice_flag,
)
from .textfn import (  # noqa: F401
    char_ngrams,
    doc_fingerprint,
    portable_hash64,
    punct_ratio,
    stopword_ratio,
    token_count_bpeish,
    token_count_ws,
    tokens,
    word_shingles,
)
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
