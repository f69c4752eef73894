"""sparkocr — a PySpark-native main-content extraction engine.

Re-expresses the deterministic document→text surface of the reference OCR
pipeline (grounding-span extraction & cleanup, bbox denormalization, page
assembly) as vectorized Arrow-batched transforms over transcript tables
``(conv_id, turn_idx, role, text, tool, ts)``, plus HTML boilerplate
stripping, PDF-layout span reconstruction, markdown/table recovery, and the
data-pipeline operators (dedup, similarity, text stats) a large-scale
training-data pipeline needs.

Design: DataFrame-first, fixed StructType schemas, no per-row Python UDFs on
the hot path (all Python work happens inside pandas/Arrow batches via
``mapInPandas``/``pandas_udf``); doc assembly is pure JVM (window +
``array_sort`` + ``aggregate``); checkpoint/resume via per-bucket lineage
manifests.
"""

__version__ = "0.1.0"
