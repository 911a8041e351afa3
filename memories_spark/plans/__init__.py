from memories_spark.plans.registry import QUERIES, QuerySpec  # noqa: F401

# Register the themed query batches (import side effects populate QUERIES).
from memories_spark.plans import (  # noqa: F401, E402
    queries_advanced,
    queries_advanced2,
    queries_ann,
    queries_catalog,
    queries_catalog2,
    queries_dedup,
    queries_funnel,
    queries_graph,
    queries_joins,
    queries_maintenance,
    queries_pipeline,
    queries_relational2,
    queries_relational3,
    queries_relational4,
    queries_retrieval2,
    queries_serving,
    queries_sketches,
    queries_stats,
    queries_streaming,
    queries_temporal,
    queries_text,
    queries_training,
    queries_training2,
    queries_training3,
)
