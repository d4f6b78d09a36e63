from .ingest import (
    crawl_stats_stream,
    dedup_pages_streaming,
    run_ingest,
    stream_extract_offers,
    stream_pages,
)

__all__ = [
    "crawl_stats_stream",
    "dedup_pages_streaming",
    "run_ingest",
    "stream_extract_offers",
    "stream_pages",
]
