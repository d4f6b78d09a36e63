from .ingest import (
    crawl_stats_stream,
    dedup_pages_streaming,
    run_ingest,
    stream_extract_offers,
    stream_pages,
)
from .stateful import dedup_ids_stateful

__all__ = [
    "crawl_stats_stream",
    "dedup_ids_stateful",
    "dedup_pages_streaming",
    "run_ingest",
    "stream_extract_offers",
    "stream_pages",
]
