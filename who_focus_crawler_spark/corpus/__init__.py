"""Training-data corpus operators: dedup, similarity, text analysis,
multimodal plumbing — the large-scale pipeline layer over the crawled
`documents` corpus (task brief: first-class alongside SURVEY.md §2)."""
