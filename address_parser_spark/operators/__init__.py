"""Relational + ER operators: blocking, scoring, resolution, clustering,
dedup, similarity search, text quality."""
