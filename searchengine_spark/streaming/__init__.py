from .incremental import StreamingIndexer, stream_corpus  # noqa: F401
