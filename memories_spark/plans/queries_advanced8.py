"""Advanced analytics batch 12: token-bucket admission control
(integer sequential state via grouped applyInPandas) and a one-pass
column-expectations audit.

Determinism: the token bucket is pure integer arithmetic (capacity,
refill, timestamps in seconds), so the pandas loop and the DuckDB
recursive-CTE oracle agree exactly; the expectations audit is all
BIGINT counts.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from memories_spark.plans.registry import register
from memories_spark.sources.tables import load_tables

# ---------------------------------------------------------------------
# Token-bucket admission per user (rate-limiter replay)
# ---------------------------------------------------------------------

_CAP = 5          # bucket capacity (tokens)
_REFILL_S = 600   # one token per 10 minutes

_BUCKET_ORACLE = f"""
WITH RECURSIVE ranked AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS t_s,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
s AS (
  SELECT user_id, 1 AS k, t_s AS last_s,
         {_CAP} - 1 AS tokens, 1 AS admitted
  FROM ranked WHERE rn = 1
  UNION ALL
  SELECT r.user_id, s.k + 1, r.t_s,
         CASE WHEN least({_CAP}, s.tokens + (r.t_s - s.last_s) // {_REFILL_S}) >= 1
              THEN least({_CAP}, s.tokens + (r.t_s - s.last_s) // {_REFILL_S}) - 1
              ELSE least({_CAP}, s.tokens + (r.t_s - s.last_s) // {_REFILL_S}) END,
         s.admitted
           + CASE WHEN least({_CAP}, s.tokens + (r.t_s - s.last_s) // {_REFILL_S}) >= 1
                  THEN 1 ELSE 0 END
  FROM s JOIN ranked r ON r.user_id = s.user_id AND r.rn = s.k + 1
),
last AS (SELECT user_id, max(k) AS n FROM s GROUP BY user_id)
SELECT l.user_id,
       CAST(l.n AS BIGINT) AS n_events,
       CAST(s.admitted AS BIGINT) AS admitted,
       CAST(l.n - s.admitted AS BIGINT) AS rejected,
       CAST(s.tokens AS BIGINT) AS tokens_left
FROM last l JOIN s ON s.user_id = l.user_id AND s.k = l.n
ORDER BY l.user_id
"""


@register(
    "token_bucket_admission",
    oracle=_BUCKET_ORACLE,
    doc="Token-bucket rate-limiter replay per user: capacity 5, one "
    "token per 10 minutes, integer refill on truncated elapsed "
    "seconds — each event is admitted iff a token is available at "
    "its arrival instant (the reference rate-limits its HTTP "
    "surface per client the same way; replaying the policy over "
    "the event log is how you'd tune it). Pure integer sequential "
    "state makes this the second grouped-applyInPandas operator "
    "(after holt_user_forecast) with an even stronger determinism "
    "story: the DuckDB recursive CTE replays the identical integer "
    "trajectory. One user_id shuffle; per-group state is O(1).",
    tags=("ops", "temporal", "udf"),
)
def token_bucket_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    base = ev.select(
        "user_id",
        F.unix_timestamp("ts").alias("t_s"),
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
    )

    def bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_us", "event_id"])
        tokens, admitted, last_s = _CAP, 0, None
        for t in pdf["t_s"]:
            t = int(t)
            if last_s is not None:
                tokens = min(_CAP, tokens + (t - last_s) // _REFILL_S)
            last_s = t
            if tokens >= 1:
                tokens -= 1
                admitted += 1
        n = len(pdf)
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_events": [n],
                "admitted": [admitted],
                "rejected": [n - admitted],
                "tokens_left": [tokens],
            }
        )

    return (
        base.groupBy("user_id")
        .applyInPandas(
            bucket,
            "user_id long, n_events long, admitted long, rejected long, "
            "tokens_left long",
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------
# Column-expectations audit (one scan, all rules)
# ---------------------------------------------------------------------

_EXPECT_ORACLE = """
WITH checks AS (
  SELECT
    CAST(count(*) AS BIGINT) AS total,
    CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS null_user,
    CAST(sum(CASE WHEN event_type NOT IN
          ('view','click','purchase','signup','error') THEN 1 ELSE 0 END)
      AS BIGINT) AS bad_type,
    CAST(sum(CASE WHEN value < 0 OR value > 100000 THEN 1 ELSE 0 END)
      AS BIGINT) AS out_of_range_value,
    CAST(sum(CASE WHEN ts < TIMESTAMP '2000-01-01'
                    OR ts > TIMESTAMP '2100-01-01' THEN 1 ELSE 0 END)
      AS BIGINT) AS bad_ts,
    CAST(sum(CASE WHEN json_valid(props) THEN 0 ELSE 1 END) AS BIGINT)
      AS bad_json,
    CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS dup_event_id
  FROM events
)
SELECT u.check_name, u.violations, c.total AS total_rows
FROM checks c,
     (SELECT 'null_user_id' AS check_name, null_user AS violations FROM checks
      UNION ALL SELECT 'unknown_event_type', bad_type FROM checks
      UNION ALL SELECT 'value_out_of_range', out_of_range_value FROM checks
      UNION ALL SELECT 'timestamp_out_of_bounds', bad_ts FROM checks
      UNION ALL SELECT 'invalid_props_json', bad_json FROM checks
      UNION ALL SELECT 'duplicate_event_id', dup_event_id FROM checks) u
ORDER BY u.check_name
"""


@register(
    "column_expectations_audit",
    oracle=_EXPECT_ORACLE,
    doc="Column-expectations audit (the Great-Expectations shape): "
    "null checks, enum membership, numeric range, timestamp "
    "bounds, JSON validity, and key uniqueness over events — ALL "
    "evaluated in ONE scan as conditional sums inside a single "
    "aggregation, then unpivoted to a per-rule report. This is "
    "the pre-ingestion gate a training pipeline runs on every "
    "batch; one-pass evaluation matters at 100 TB because the "
    "naive one-query-per-rule suite re-reads the table six times. "
    "JSON validity stays in codegen (get_json_object null-check), "
    "uniqueness is count minus count-distinct in the same pass.",
    tags=("ops", "quality"),
)
def column_expectations_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir)["events"]
    flag = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731
    checks = ev.agg(
        F.count("*").alias("total"),
        flag(F.col("user_id").isNull()).alias("null_user_id"),
        flag(
            ~F.col("event_type").isin(
                "view", "click", "purchase", "signup", "error"
            )
        ).alias("unknown_event_type"),
        flag((F.col("value") < 0) | (F.col("value") > 100000)).alias(
            "value_out_of_range"
        ),
        flag(
            (F.col("ts") < F.lit("2000-01-01").cast("timestamp"))
            | (F.col("ts") > F.lit("2100-01-01").cast("timestamp"))
        ).alias("timestamp_out_of_bounds"),
        flag(F.get_json_object("props", "$").isNull()).alias(
            "invalid_props_json"
        ),
        (F.count("*") - F.countDistinct("event_id")).alias(
            "duplicate_event_id"
        ),
    )
    rules = [
        "duplicate_event_id",
        "invalid_props_json",
        "null_user_id",
        "timestamp_out_of_bounds",
        "unknown_event_type",
        "value_out_of_range",
    ]
    stack = ", ".join(f"'{r}', {r}" for r in rules)
    return (
        checks.selectExpr(
            f"stack({len(rules)}, {stack}) AS (check_name, violations)",
            "total AS total_rows",
        )
        .orderBy("check_name")
    )
