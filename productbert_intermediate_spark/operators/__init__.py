"""Dataflow operators: extract, blocking, scoring, clustering, dedup, metrics."""
