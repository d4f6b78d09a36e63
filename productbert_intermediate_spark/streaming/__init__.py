from .ingest import (
    crawl_stats_stream,
    dedup_pages_streaming,
    run_ingest,
    stream_extract_offers,
    stream_pages,
)
from .incremental_er import (
    resolve_batch_increment,
    run_incremental_er,
    run_incremental_er_offers,
)
from .stateful import dedup_ids_stateful

__all__ = [
    "crawl_stats_stream",
    "dedup_ids_stateful",
    "resolve_batch_increment",
    "run_incremental_er",
    "run_incremental_er_offers",
    "dedup_pages_streaming",
    "run_ingest",
    "stream_extract_offers",
    "stream_pages",
]
