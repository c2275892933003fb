from .rollup import streaming_tumbling_rollup  # noqa: F401
