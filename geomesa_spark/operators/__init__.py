"""Engine operators (SURVEY.md §2): spatial joins, kNN, tiling/density,
stats, track processes, dedup/similarity/text ops, multimodal plumbing."""
