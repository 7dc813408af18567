"""Logical plans: the batch-iterative crawl loop (SURVEY.md §3.1)."""
