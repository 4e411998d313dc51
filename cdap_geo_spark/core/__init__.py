"""NumPy geometry/cell kernels — no Spark imports allowed in this package.

These modules are the vectorized compute layer invoked from Arrow
pandas UDFs (``cdap_geo_spark.udfs``). Keeping them Spark-free makes
them unit-testable without a JVM.
"""
