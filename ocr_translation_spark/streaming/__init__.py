from .micro_batch import stream_extract  # noqa: F401
