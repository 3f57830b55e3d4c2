"""Engine operators: relational recipes, dataflow surface, and the
LLM-data-pipeline extensions (dedup / similarity / text / multimodal)."""
