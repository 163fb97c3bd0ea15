"""ragflow_ocr_spark — a PySpark-native web-scale extraction engine.

From-scratch reimplementation of the *capabilities* of
Ikaros-521/RAGFlow-OCR (two-stage detect-then-recognize text
extraction), grafted onto Common-Crawl-style webtext:

- ``kernels/``  pure-Python/numpy deterministic core (no Spark dep):
  HTML boilerplate stripping, PNG codec, detect/recognize stub
  networks with the reference's I/O contract, DB postprocess, CTC
  greedy decode, reading-order sort.
- ``spark/``    mapInPandas stages, the end-to-end pipeline,
  checkpoint/resume, synthetic page generation.
- ``ops/``      relational + training-data operators (dedup,
  similarity search, text stats) over plain DataFrames.
- ``jobs/``     spark-submit entry points.

Design rules (see SURVEY.md):
- DataFrame everywhere; Python only inside iterator-style
  ``mapInPandas`` kernels (Arrow batches, init-once per worker).
- No per-row Spark UDFs; numpy/vectorized work inside batches.
- Deterministic: every output is a pure function of the input row.
"""

__version__ = "0.1.0"
