"""Pipelines (checkpointed stage DAGs): end-to-end KG construction,
embedding training, inference, and evaluation."""
