from .ingest import (
    crawl_stats_stream,
    dedup_pages_streaming,
    run_ingest,
    stream_extract_offers,
    stream_pages,
)
from .incremental_er import (
    read_corpus_indexed,
    read_entities_indexed,
    read_match_edges_indexed,
    resolve_batch_increment,
    resolve_batch_indexed,
    resolve_batch_retract,
    resolve_batch_upsert,
    run_incremental_er,
    run_incremental_er_offers,
    run_incremental_retractions,
)
from .stateful import dedup_ids_stateful

__all__ = [
    "crawl_stats_stream",
    "dedup_ids_stateful",
    "read_corpus_indexed",
    "read_entities_indexed",
    "read_match_edges_indexed",
    "resolve_batch_increment",
    "resolve_batch_indexed",
    "resolve_batch_retract",
    "resolve_batch_upsert",
    "run_incremental_er",
    "run_incremental_er_offers",
    "run_incremental_retractions",
    "dedup_pages_streaming",
    "run_ingest",
    "stream_extract_offers",
    "stream_pages",
]
