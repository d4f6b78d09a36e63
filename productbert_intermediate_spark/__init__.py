"""productbert_intermediate_spark — a PySpark-native entity-resolution engine.

A from-scratch record-linkage pipeline (blocking → pairwise scoring → transitive
clustering) over Common-Crawl-style web-page tables, with the query and
data-processing capabilities of the reference research pipeline
(wbsg-uni-mannheim/productbert-intermediate, single-node pandas/PyTorch) —
re-expressed as lazy, distributed Spark DataFrame plans.

Layout:
  functions/   scalar/text functions (cleaning, tokenization, similarity, stemming)
  operators/   dataflow operators (extract, blocking, scoring, clustering, dedup, ...)
  sources/     stage catalog (checkpoint tables + manifest lineage)
  synth/       deterministic synthetic fixtures (FIXTURES.md)
  plans/       end-to-end pipeline drivers
  streaming/   (intentionally empty — the reference has no streaming; see SURVEY.md §2.8)
"""

__version__ = "0.1.0"
