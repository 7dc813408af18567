"""Structured Streaming variant of the crawl dataflow (SURVEY.md §2.2
R36-R40). The deterministic-match path is the batch loop (plans/crawl.py,
SURVEY.md §1.3); this layer provides the streaming-mode operators for
continuous frontier ingest and live metrics."""
