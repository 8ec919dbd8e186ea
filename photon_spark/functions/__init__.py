"""LLM-data-pipeline operators (BASELINE.json north_star): text analysis,
deduplication, similarity search, multimodal columns.

All hot-path logic uses built-in pyspark.sql.functions (JVM-side,
whole-stage-codegen'd); Python appears only in the multimodal decode stubs
(Arrow-batched mapInPandas)."""

from photon_spark.functions import dedup, multimodal, similarity, text  # noqa: F401
