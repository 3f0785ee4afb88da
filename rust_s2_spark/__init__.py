"""rust_s2_spark — a from-scratch PySpark-native S2 spatial-join + tiling engine.

Semantics parity with the public S2 geometry library (reference:
opacous/rust-s2 at /root/reference); architecture is Spark-first:
numpy kernels inside pandas/Arrow UDFs, bit-op Column expressions for
hierarchy math, covering-explode cell-prefix joins, explicit skew salting.
"""

__version__ = "0.1.0"
