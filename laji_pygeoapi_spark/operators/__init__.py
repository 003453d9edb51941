"""Relational + spatial operators (SURVEY.md §2): dedup, merge, metadata,
spatial join, kNN, tiling, similarity, text analytics."""
