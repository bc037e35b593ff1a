"""Scalar / per-document functions: text statistics, quality scoring,
language identification, fingerprinting, similarity search."""
