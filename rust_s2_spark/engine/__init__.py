"""Spark DataFrame pipeline: UDF wrappers, tiling, joins, skew handling, checkpoints."""
