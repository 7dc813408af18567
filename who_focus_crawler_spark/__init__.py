"""who_focus_crawler_spark — a PySpark-native focused-crawl frontier engine.

Built from scratch (NOT a port) with the query/data-processing capabilities
of the reference crawler ``jfqiao/who.focus_crawler``. The reference source
tree at /root/reference is empty (see SURVEY.md §0.1); the behavioral
contract is defined by BASELINE.json (north_star / north_rule / input_hint)
and frozen by this repo's own golden fixtures (SURVEY.md §5.3).

Layout:
  functions/   scalar column-level building blocks (URL canon, text, vectors)
  operators/   crawl-domain dataflow operators (C1..C17 of SURVEY.md §2.1)
               plus training-data-pipeline ops (dedup, similarity, multimodal)
  sources/     schema'd readers + the deterministic synthetic fixture web
  plans/       the batch-iterative crawl loop (SURVEY.md §3.1)
  checkpoint/  Iceberg-semantics snapshot shim (atomic commit + resume)
  streaming/   Structured Streaming variants (R36-R40)
"""

__version__ = "0.1.0"
