"""mq_to_db_spark — a PySpark-native time-series rollup + downsample + retention
engine over multi-turn conversation/agent transcript tables.

Built from scratch against the *behavior* of christiangda/mq-to-db (a Go
RabbitMQ→PostgreSQL ingest dataflow; see SURVEY.md): its at-least-once
ack/reject delivery becomes idempotent checkpointed per-partition batch
processing; its Prometheus/Grafana metrics plane (windowed rates, histogram
quantiles, per-worker counters) becomes first-class continuous aggregates at
1m/1h/1d retention tiers; its dead-letter routing becomes a side-output
reject DataFrame.  Everything is DataFrame/Catalyst-native except the
Gorilla-style codec, which is an Arrow-vectorized grouped-map pandas UDF.

Input schema (BASELINE.json input_hint):
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp
"""

__version__ = "0.1.0"

from mq_to_db_spark.config import EngineConfig
from mq_to_db_spark.session import get_spark

__all__ = ["EngineConfig", "get_spark", "__version__"]
