"""Crawl-domain operators (SURVEY.md §2.1 C1-C17) and training-data
pipeline operators (dedup, similarity, text analysis, multimodal)."""
