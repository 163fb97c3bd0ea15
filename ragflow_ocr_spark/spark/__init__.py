"""Spark-side layer: session factory, synthetic page generation,
mapInPandas stages, the end-to-end extraction pipeline, and
checkpoint/resume plumbing."""
