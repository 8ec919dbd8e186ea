"""photon_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of microserviceux/photon (reference studied at
/root/reference; see SURVEY.md for the full blueprint with file:line parity
citations).

Photon is an event store with hot/cold replay and continuous ordered-fold
projections (reference: src/photon/streams.clj). This package re-expresses
that surface Spark-first:

- one canonical, partitioned **events table** (``photon_spark.events``)
- cold/hot/hot-cold **replay** as batch reads / Structured Streaming
  (``photon_spark.replay``, ``photon_spark.streaming``)
- **projections** = ordered folds with a queryable state store
  (``photon_spark.projections``), built-in reducers compiled to native
  Catalyst aggregates
- sampled **schema inference** (``photon_spark.schema_infer``)
- the event-sourced **catalog/control plane** (``photon_spark.catalog``)
- LLM-data-pipeline extensions: dedup, similarity search, text analysis,
  multimodal columns (``photon_spark.functions``)
"""

from photon_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
