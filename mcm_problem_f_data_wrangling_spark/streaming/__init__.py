from .rollup import streaming_tumbling_rollup  # noqa: F401
from .dedup import dedup_stream  # noqa: F401
from .sessionize import sessionize_batch, sessionize_stream  # noqa: F401
