"""Reusable DataFrame-to-DataFrame operators beyond the built-in surface:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
similarity search, as-of and range joins.
"""
