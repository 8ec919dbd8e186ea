from photon_spark.streaming.corpus import StreamingCorpusIngest
from photon_spark.streaming.ingest import StreamingIngest
from photon_spark.streaming.keyed import keyed_running_totals
from photon_spark.streaming.replay import read_hot, read_hot_cold
from photon_spark.streaming.stateful import StreamingProjectionRunner

__all__ = ["read_hot", "read_hot_cold", "StreamingProjectionRunner",
           "StreamingIngest", "StreamingCorpusIngest",
           "keyed_running_totals"]
