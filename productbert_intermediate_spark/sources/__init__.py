"""Sources/sinks: stage checkpoint catalog + manifest lineage."""
