"""xlearning_spark — a PySpark-native analytics engine.

Re-expresses the data-processing capabilities of Qihoo360/XLearning
(Hbox — a YARN scheduling platform for distributed ML training; see
SURVEY.md) as an idiomatic Spark DataFrame/SQL engine, extended with
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Public surface:
    Engine            — session + table registry (xlearning_spark.engine)
    job.submit        — hbox-submit-style job lifecycle: validate ->
                        deliver (DOWNLOAD/PLACEHOLDER/STREAM) -> pipe
                        -> commit (xlearning_spark.job)
    operators.*       — dedup / similarity / text / asof / pipe /
                        sharding / multimodal
    sources.*         — table loading, input-delivery strategies
                        (delivery), sinks + commit protocol (sinks)
    streaming.*       — metrics pipeline (windows, watermark, sessions,
                        checkpointed replay)
    ml                — barrier-mode ClusterSpec rendezvous + MLlib
                        training analogue
    queries.registry  — the oracle-checked query corpus (SURVEY.md §2)
"""

from xlearning_spark.engine import Engine

__all__ = ["Engine"]
__version__ = "0.1.0"
