"""Scalar / vectorized function library (the reference's ``Feature/`` layer,
re-expressed as Spark column expressions and pandas UDFs)."""
