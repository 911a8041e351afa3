"""Near-duplicate detection: exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine.

Reference semantics: all-pairs cosine >= 0.90, delete the larger id
of each pair (reference memory_engine.py:2199-2272); smart-import
novelty bands sim>=0.95 skip / <0.80 add / else borderline
(memory_engine.py:2564-2637). The training-data-pipeline additions
(MinHash/SimHash/Jaccard families) follow the standard sketch
constructions, built so every hash is md5-based and reproducible in
any engine.

Scale design: nothing here is O(N^2) on the full corpus —
- MinHash pairs only form inside an LSH band bucket (banding theory:
  b bands of r rows catch pairs with J >~ (1/b)^(1/r));
- SimHash pairs only form inside a prefix block;
- n-gram Jaccard pairs only form inside a caller-supplied block
  (e.g. source);
- embedding pairs only form inside a sign-projection bucket.
Each family is: per-doc sketch (one narrow shuffle-free projection) →
groupBy bucket → within-bucket pair join → exact re-verification of
candidates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from memories_spark.functions.texttools import tokens_expr
from memories_spark.operators.partitioning import spread_for_compute

NUM_HASHES = 8
BAND_ROWS = 2  # 4 bands x 2 rows


# --- MinHash + LSH ----------------------------------------------------

def minhash_signatures(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, sig: array<long> of NUM_HASHES minima) in ONE pass.

    Tokens-as-shingles (w=1): right for short-text corpora where
    vocabulary overlap IS the duplication signal; swap in
    word_shingles_expr(text, n) for long documents.

    Each hash is the first 60 bits of the md5 as a BIGINT (the same
    trick rareterm_jaccard_join uses): min over longs is a
    fixed-width aggregation buffer, so the per-doc reduction runs as
    a HashAggregate — min over the 32-char hex strings forced a
    SortAggregate, i.e. a full sort of the exploded token table —
    and the shuffled signature rows carry 8 longs instead of 8
    strings (~4x narrower). The oracle (minhash_pairs_sql) hashes
    IDENTICALLY, so signature equality — the only thing est_sim and
    banding consume — is engine-identical by construction.

    Scale shape: each exploded token row computes all NUM_HASHES md5s
    as columns, so the shuffle carries one row per (doc, token) — not
    NUM_HASHES of them — and every per-seed min gets a map-side
    partial aggregate. The result is one narrow row per doc.
    """
    # Spread a narrow corpus scan before the tokenize + 8-way md5
    # bank — per-row cost dwarfs byte size (see partitioning.py).
    toks = spread_for_compute(docs.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens_expr(text_col))).alias("tok"),
    )
    hashed = toks.select(
        "id",
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{s}:"), F.col("tok"))), 1, 15
                ),
                16,
                10,
            )
            .cast("long")
            .alias(f"h{s}")
            for s in range(NUM_HASHES)
        ],
    )
    mins = hashed.groupBy("id").agg(
        *[F.min(f"h{s}").alias(f"h{s}") for s in range(NUM_HASHES)]
    )
    return mins.select(
        "id", F.array(*[f"h{s}" for s in range(NUM_HASHES)]).alias("sig")
    )


def _band_keys(df: DataFrame, id_col: str) -> DataFrame:
    """Explode a ``sig`` array column into (id_col, band, key) rows.

    The key is a struct of the band's BAND_ROWS signature longs —
    struct equality in the band self-join, 8 bytes per position
    instead of a concatenated string."""
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.struct(
                *[
                    F.col("sig").getItem(b * BAND_ROWS + r).alias(f"p{r}")
                    for r in range(BAND_ROWS)
                ]
            ).alias("key"),
        )
        for b in range(NUM_HASHES // BAND_ROWS)
    ]
    return df.select(
        id_col, F.explode(F.array(*band_structs)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def _sig_matches(sig_a: str, sig_b: str) -> F.Column:
    """Count of agreeing signature positions (JVM-side fold)."""
    return F.aggregate(
        F.zip_with(F.col(sig_a), F.col(sig_b), lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def minhash_candidate_pairs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """LSH banding: (id_a, id_b, est_sim) — est = matching sigs / K.

    The signature table is cached: the band self-join and both sides
    of the verification join reuse it instead of recomputing the
    tokenize+hash pass (at cluster scale, a written-out sketch table
    plays this role).
    """
    sig = minhash_signatures(docs, id_col, text_col).cache()
    band_keys = _band_keys(sig, "id")
    a = band_keys.select(F.col("id").alias("id_a"), "band", "key")
    b = band_keys.select(F.col("id").alias("id_b"), "band", "key")
    cand = (
        a.join(b, ["band", "key"]).filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )
    sa = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (_sig_matches("sig_a", "sig_b") / F.lit(float(NUM_HASHES))).alias("est_sim"),
        )
    )


def minhash_dedup_victims(
    docs: DataFrame, id_col: str, text_col: str, threshold: float = 0.75
) -> DataFrame:
    """Victim ids — the larger id of every LSH candidate pair with
    ``est_sim >= threshold`` — WITHOUT materializing the pair list.

    est_sim is a function of the signatures alone, so the band join
    runs over DISTINCT signatures (each keyed by its group's min doc
    id). A doc ``b`` is a victim iff some qualifying partner group
    (its own included, via the self band match) has ``min_id < b``;
    per group that reduces to one threshold ``thr = min(partner
    min_id)`` and victims are the members ``> thr``. In a
    duplicate-heavy corpus this replaces O(dup²) pair verification
    with O(distinct-sig²-within-band) — the pair list itself (5.6M
    pairs at sf0.1 on the synthetic corpus) is never built.
    """
    sig = minhash_signatures(docs, id_col, text_col).cache()
    groups = sig.groupBy("sig").agg(F.min("id").alias("gid")).cache()
    gb = _band_keys(groups, "gid")
    cand = (
        gb.select(F.col("gid").alias("gid_a"), "band", "key")
        .join(gb.select(F.col("gid").alias("gid_b"), "band", "key"), ["band", "key"])
        .select("gid_a", "gid_b")
        .distinct()
    )
    qual = (
        cand.join(groups.select(F.col("gid").alias("gid_a"), F.col("sig").alias("sig_a")), "gid_a")
        .join(groups.select(F.col("gid").alias("gid_b"), F.col("sig").alias("sig_b")), "gid_b")
        .filter(
            (_sig_matches("sig_a", "sig_b") / F.lit(float(NUM_HASHES))) >= F.lit(threshold)
        )
    )
    thr = qual.groupBy("gid_a").agg(F.min("gid_b").alias("thr"))
    return (
        sig.join(groups, "sig")
        .join(thr, F.col("gid") == F.col("gid_a"))
        .filter(F.col("id") > F.col("thr"))
        .select(F.col("id").alias("victim_id"))
    )


def minhash_pairs_sql(docs_view: str, id_col: str, text_col: str) -> str:
    """DuckDB oracle ending in ``pairs(id_a, id_b, est_sim)``."""
    toks = (
        f"SELECT {id_col} AS id, unnest(list_distinct(list_filter("
        f"regexp_split_to_array(lower(trim({text_col})), '\\s+'), t -> t != ''))) AS tok "
        f"FROM {docs_view}"
    )
    return f"""
WITH toks AS ({toks}),
seeds AS (SELECT unnest(range({NUM_HASHES})) AS seed),
sig AS (
  SELECT id, seed,
         min(CAST('0x' || substr(md5(CAST(seed AS VARCHAR) || ':' || tok), 1, 15) AS BIGINT)) AS h
  FROM toks CROSS JOIN seeds GROUP BY id, seed
),
band_keys AS (
  SELECT id, CAST(seed // {BAND_ROWS} AS INT) AS band,
         string_agg(CAST(seed AS VARCHAR) || '@' || CAST(h AS VARCHAR), '|'
                    ORDER BY seed) AS key
  FROM sig GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM band_keys a JOIN band_keys b ON a.band = b.band AND a.key = b.key AND a.id < b.id
),
pairs AS (
  SELECT c.id_a, c.id_b,
         sum(CASE WHEN sa.h = sb.h THEN 1 ELSE 0 END) / {float(NUM_HASHES)!r} AS est_sim
  FROM cand c
  JOIN sig sa ON sa.id = c.id_a
  JOIN sig sb ON sb.id = c.id_b AND sb.seed = sa.seed
  GROUP BY c.id_a, c.id_b
)
"""


# --- exact Jaccard (verification / n-gram family) ---------------------

def jaccard_pairs(
    docs: DataFrame,
    id_col: str,
    shingles: F.Column,
    block: F.Column,
    threshold: float,
) -> DataFrame:
    """Blocked exact Jaccard: pairs within a block with J >= threshold.

    J = |A∩B| / (|A| + |B| - |A∩B|) computed from exact integer
    counts — cross-engine deterministic without fixed-point tricks.
    """
    base = docs.select(F.col(id_col).alias("id"), shingles.alias("sh"), block.alias("blk"))
    sized = base.select("id", "blk", "sh", F.size("sh").alias("n"))
    ex = sized.select("id", "blk", "n", F.explode("sh").alias("s"))
    a = ex.select(F.col("id").alias("id_a"), F.col("blk"), F.col("n").alias("na"), "s")
    b = ex.select(F.col("id").alias("id_b"), F.col("blk"), F.col("n").alias("nb"), "s")
    inter = (
        a.join(b, ["blk", "s"]).filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count("*").alias("i"))
    )
    j = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i")).cast("double")
    return inter.select("id_a", "id_b", F.round(j, 6).alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


# --- SimHash ----------------------------------------------------------

SIMHASH_BITS = 16


def simhash_expr(text_col: str, bits: int = SIMHASH_BITS) -> F.Column:
    """Bit-string SimHash over the distinct token set.

    Bit j of a token = parity of hex digit j of md5(token); the doc
    bit is the sign of sum(+1/-1) over tokens. Pure integer counts →
    engine-agnostic.
    """
    toks = F.array_distinct(tokens_expr(text_col))

    def _voter(j: int):
        return lambda acc, t: acc + F.when(
            F.substring(F.md5(t), j + 1, 1).isin("1", "3", "5", "7", "9", "b", "d", "f"),
            F.lit(1),
        ).otherwise(F.lit(-1))

    bit_cols = []
    for j in range(bits):
        vote = F.aggregate(toks, F.lit(0), _voter(j))
        bit_cols.append(F.when(vote > 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bit_cols)


def simhash_sql(text_col: str, bits: int = SIMHASH_BITS) -> str:
    """DuckDB mirror of :func:`simhash_expr`."""
    toks = (
        f"list_distinct(list_filter(regexp_split_to_array(lower(trim({text_col})), '\\s+'),"
        " t -> t != ''))"
    )
    bit_exprs = []
    for j in range(bits):
        vote = (
            f"list_sum(list_transform({toks}, t -> CASE WHEN substr(md5(t), {j + 1}, 1)"
            f" IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END))"
        )
        bit_exprs.append(f"CASE WHEN ({vote}) > 0 THEN '1' ELSE '0' END")
    return "(" + " || ".join(bit_exprs) + ")"


def hamming_sql(a: str, b: str, bits: int = SIMHASH_BITS) -> str:
    terms = " + ".join(
        f"CASE WHEN substr({a}, {j}, 1) != substr({b}, {j}, 1) THEN 1 ELSE 0 END"
        for j in range(1, bits + 1)
    )
    return f"({terms})"


def hamming_expr(a: F.Column, b: F.Column, bits: int = SIMHASH_BITS) -> F.Column:
    out = F.lit(0)
    for j in range(1, bits + 1):
        out = out + F.when(F.substring(a, j, 1) != F.substring(b, j, 1), 1).otherwise(0)
    return out
