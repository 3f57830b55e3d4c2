"""LLM-data-pipeline queries (north-star extensions): dedup family,
similarity search, text analysis, multimodal plumbing.
"""
