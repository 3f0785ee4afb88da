"""Pure-numpy geometry kernels (importable without Spark)."""
