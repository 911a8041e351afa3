"""Engine-level IVF vector index: build once, probe by partition
pruning — the serving-side analogue of the reference's Qdrant HNSW
collection (reference qdrant_store.py: the vector store IS an
approximate index; the brute-force scan in ``search.py`` is the exact
fallback).

Build (``build_ivf``): seed centroids from a deterministic md5-spread
of row ids, one Lloyd refinement (per-cell fixed-point means — the
same integer-exact k-means step as ``plans/queries_ann.py``), then
every vector is assigned to its nearest trained cell and the
assignment is persisted PARTITIONED BY cell. At 100 TB this is the
one-off FAISS train+add job; the centroid table is k x dim rows.

Probe: the query vector's nearest cells are computed DRIVER-SIDE
against the collected k x dim centroid table (a few KB — zero extra
Spark jobs per search), and the candidate scan reads only those
cells' partition directories.

Staleness: the index records the store's table version at build time;
consumers compare versions and fall back to the exact scan after any
mutation (an incremental index update is the production path; exact
fallback keeps results correct meanwhile).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.hashing import fixed_point


def pts(emb: DataFrame, id_col: str, dim: int) -> DataFrame:
    """Explode vectors to (id, d, x) dim-rows."""
    return emb.select(
        F.col(id_col).alias("id"),
        F.explode(F.sequence(F.lit(1), F.lit(dim))).alias("d"),
        F.col("embedding"),
    ).select(
        "id", "d", F.element_at("embedding", F.col("d")).cast("double").alias("x")
    )


def dists_to(p: DataFrame, cents: DataFrame) -> DataFrame:
    """Fixed-point squared-L2 of every id against every centroid cid.
    Integer-summed (order-independent); the k x dim centroid table
    broadcasts, the only shuffle is the per-vector partial sum."""
    return (
        p.join(F.broadcast(cents), p.d == cents.sd)
        .select(
            "id",
            "cid",
            F.round((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")) * F.lit(1e9))
            .cast("long")
            .alias("t_fp"),
        )
        .groupBy("id", "cid")
        .agg(F.sum("t_fp").alias("dist_fp"))
    )


def train_centroids(
    emb: DataFrame, id_col: str, dim: int, seed_ids: list[int]
) -> DataFrame:
    """Seed-init + ONE Lloyd refinement -> (cid, sd, c)."""
    p = pts(emb, id_col, dim)
    seeds = p.filter(F.col("id").isin(seed_ids)).select(
        F.col("id").alias("cid"), F.col("d").alias("sd"), F.col("x").alias("c")
    )
    w = Window.partitionBy("id").orderBy(F.asc("dist_fp"), F.asc("cid"))
    a1 = (
        dists_to(p, seeds)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("id", "cid")
    )
    return (
        a1.join(p, "id")
        .groupBy("cid", "d")
        .agg(F.sum(fixed_point(F.col("x"), 7)).alias("s"), F.count("*").alias("cnt"))
        .select(
            "cid",
            F.col("d").alias("sd"),
            (F.col("s").cast("double") / F.col("cnt") / F.lit(10000000.0)).alias("c"),
        )
    )


def build_ivf(
    spark: SparkSession,
    emb: DataFrame,
    id_col: str,
    index_dir: str,
    cells: int = 16,
    nprobe: int = 3,
    version: int = 0,
) -> dict:
    """Train + assign + persist. Returns the meta dict written to
    ``index_dir/meta.json``. Seed ids are the ``cells`` rows with the
    smallest md5(id) — a deterministic pseudo-random spread valid for
    any id distribution (collecting ``cells`` scalars)."""
    first = emb.select(F.size("embedding").alias("n")).first()
    if first is None:
        raise ValueError("cannot index an empty vector set")
    dim = int(first.n)
    seed_rows = (
        emb.select(F.col(id_col).alias("id"))
        .orderBy(F.md5(F.col("id").cast("string")), F.col("id"))
        .limit(cells)
        .collect()
    )
    seed_ids = [int(r.id) for r in seed_rows]

    tmp = f"{index_dir}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    cent = train_centroids(emb, id_col, dim, seed_ids)
    cent.coalesce(1).write.parquet(os.path.join(tmp, "centroids"))
    read_cent = spark.read.parquet(os.path.join(tmp, "centroids"))
    aw = Window.partitionBy("id").orderBy(F.asc("dist_fp"), F.asc("cid"))
    assign = (
        dists_to(pts(emb, id_col, dim), read_cent)
        .withColumn("rk", F.row_number().over(aw))
        .filter(F.col("rk") == 1)
        .select("id", F.col("cid").alias("cell"))
    )
    assign.write.partitionBy("cell").parquet(os.path.join(tmp, "assign"))
    meta = {
        "version": int(version),
        "cells": int(cells),
        "nprobe": int(nprobe),
        "dim": dim,
        "seed_ids": seed_ids,
    }
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        f.write(json.dumps(meta))
    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    os.rename(tmp, index_dir)
    return meta


def refresh_ivf(
    spark: SparkSession,
    emb: DataFrame,
    id_col: str,
    index_dir: str,
    version: int,
) -> dict:
    """Re-assign the CURRENT vector set to the existing trained
    centroids and swap the assignment in — the incremental
    index-maintenance path (FAISS ``add`` without ``train``): one
    broadcast-join assignment pass instead of seed selection + Lloyd.
    Correct for any mutation mix (the whole live set is re-assigned);
    only centroid QUALITY drifts until the next full build."""
    meta = read_meta(index_dir)
    if meta is None:
        raise ValueError(f"no index at {index_dir} to refresh")
    dim = int(meta["dim"])
    cent = spark.read.parquet(os.path.join(index_dir, "centroids"))
    aw = Window.partitionBy("id").orderBy(F.asc("dist_fp"), F.asc("cid"))
    assign = (
        dists_to(pts(emb.select(F.col(id_col).alias(id_col), "embedding"), id_col, dim), cent)
        .withColumn("rk", F.row_number().over(aw))
        .filter(F.col("rk") == 1)
        .select("id", F.col("cid").alias("cell"))
    )
    tmp = os.path.join(index_dir, f"assign.tmp-{uuid.uuid4().hex[:8]}")
    assign.write.partitionBy("cell").parquet(tmp)
    final = os.path.join(index_dir, "assign")
    old = os.path.join(index_dir, f"assign.old-{uuid.uuid4().hex[:8]}")
    os.rename(final, old)
    os.rename(tmp, final)
    shutil.rmtree(old)
    spark.catalog.refreshByPath(final)
    meta["version"] = int(version)
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        f.write(json.dumps(meta))
    return meta


def read_meta(index_dir: str) -> dict | None:
    path = os.path.join(index_dir, "meta.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.loads(f.read())
    except (ValueError, OSError):
        return None


def probe_cells(spark: SparkSession, index_dir: str, qvec: list[float], nprobe: int) -> list[int]:
    """The query's ``nprobe`` nearest cells, computed DRIVER-SIDE over
    the collected k x dim centroid table (a few KB) with the same
    fixed-point arithmetic as the build — no Spark job."""
    cents: dict[int, dict[int, float]] = {}
    for r in spark.read.parquet(os.path.join(index_dir, "centroids")).collect():
        cents.setdefault(int(r.cid), {})[int(r.sd)] = float(r.c)
    dists = []
    for cid, dims in cents.items():
        acc = 0
        for d, c in dims.items():
            x = qvec[d - 1]
            acc += int(round((x - c) * (x - c) * 1e9))
        dists.append((acc, cid))
    dists.sort()
    return [cid for _, cid in dists[:nprobe]]


def candidate_ids(spark: SparkSession, index_dir: str, cells: list[int]) -> DataFrame:
    """The probed cells' id set — a partition-pruned scan of the
    persisted assignment."""
    return (
        spark.read.parquet(os.path.join(index_dir, "assign"))
        .filter(F.col("cell").isin(cells))
        .select("id")
    )
