"""Scalar function layer: decimal/money parity helpers, text analysis,
vector math. All JVM-side ``pyspark.sql.functions`` compositions —
no row-at-a-time Python in the hot path."""
