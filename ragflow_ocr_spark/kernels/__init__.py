"""Pure-Python/numpy deterministic kernels. No Spark imports here —
everything is unit-testable without a JVM and is shipped to executors
inside mapInPandas closures.
"""
