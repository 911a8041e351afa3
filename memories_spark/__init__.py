"""memories_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference system
(divyekant/memories: hybrid BM25+vector retrieval with RRF fusion,
graph expansion via personalized PageRank, recency/confidence decay
ranking, near-duplicate detection, lifecycle policies, and SQL
analytics over usage events) — plus the large-scale training-data
pipeline operators (dedup families, ANN search, text quality stats)
that a 100 TB corpus needs.

Everything is declarative DataFrame/SQL so Catalyst can push filters,
prune columns, broadcast small sides and re-plan with AQE. Python
UDFs are avoided in hot paths; where Python is unavoidable the code
uses Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

from memories_spark.session import get_spark  # noqa: F401
