"""Engine-level IVF vector index: build once, probe by partition
pruning — the serving-side analogue of the reference's Qdrant HNSW
collection (reference qdrant_store.py: the vector store IS an
approximate index; the brute-force scan in ``search.py`` is the exact
fallback).

Build (``build_ivf``): seed centroids from a deterministic md5-spread
of row ids, one Lloyd refinement (per-cell fixed-point means — the
same integer-exact k-means step as ``plans/queries_ann.py``), then
every vector is assigned to its nearest trained cell and the
assignment is persisted PARTITIONED BY (part, cell) — ``part`` is the
store's folder partition value, ``cell`` the IVF cell. At 100 TB this
is the one-off FAISS train+add job; the centroid table is k x dim
rows.

Probe: the query vector's nearest cells are computed DRIVER-SIDE
against the centroid table — collected ONCE per index build and
memoized on the centroid files' identity (a few KB; zero Spark jobs
per search after warm-up) — and the candidate scan reads only those
cells' partition directories.

Maintenance (``refresh_ivf``): INCREMENTAL — the engine diffs its
per-folder file signatures against the ones pinned in the index meta
and re-assigns ONLY the folders that changed since the pinned
version; unchanged folders' assignment files are untouched bytes,
and deleted folders' partitions are dropped. That is the FAISS
``add``/``remove_ids`` catch-up: O(changed data), not O(live set).
Centroid QUALITY still drifts until the next full ``build_ivf``.

Staleness: the index records the store's table version at build time;
consumers compare versions and fall back to the exact scan after any
mutation until the next build/refresh, so results are never silently
stale. A refresh that leaves the live vector set EMPTY removes the
meta (not a part-less directory a reader would choke on), which IS
the exact-scan fallback signal.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import threading
import uuid
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from memories_spark.functions.hashing import fixed_point

#: Partition value used when the caller supplies no part column.
DEFAULT_PART = "(all)"

_ASSIGN_SCHEMA = "id long, part string, cell long"


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


def _assign(emb: DataFrame, id_col: str, dim: int, cents: DataFrame) -> DataFrame:
    """(id, part, cell): nearest trained cell per vector, carrying the
    caller's ``part`` column (folder) for incremental maintenance."""
    aw = Window.partitionBy("id").orderBy(F.asc("dist_fp"), F.asc("cid"))
    parts = (
        emb.select(F.col(id_col).alias("id"), F.col("part"))
        if "part" in emb.columns
        else emb.select(F.col(id_col).alias("id"), F.lit(DEFAULT_PART).alias("part"))
    )
    nearest = (
        dists_to(pts(emb, id_col, dim), cents)
        .withColumn("rk", F.row_number().over(aw))
        .filter(F.col("rk") == 1)
        .select("id", F.col("cid").alias("cell"))
    )
    return nearest.join(parts, "id").select("id", "part", "cell")


def build_ivf(
    spark: SparkSession,
    emb: DataFrame,
    id_col: str,
    index_dir: str,
    cells: int = 16,
    nprobe: int = 3,
    version: int = 0,
    folder_sigs: dict[str, str] | None = None,
) -> dict:
    """Train + assign + persist. Returns the meta dict written to
    ``index_dir/meta.json``. Seed ids are the ``cells`` rows with the
    smallest md5(id) — a deterministic pseudo-random spread valid for
    any id distribution (collecting ``cells`` scalars). ``emb`` may
    carry a ``part`` column (the store folder); ``folder_sigs`` pins
    the per-folder file signatures the incremental refresh diffs
    against."""
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

    prev = read_meta(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    gen = new_gen_name()
    tmp = os.path.join(index_dir, f".tmp-{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp, exist_ok=True)
    cent = train_centroids(emb, id_col, dim, seed_ids)
    cent.coalesce(1).write.parquet(os.path.join(tmp, "centroids"))
    read_cent = spark.read.parquet(os.path.join(tmp, "centroids"))
    _assign(emb, id_col, dim, read_cent).write.partitionBy("part", "cell").parquet(
        os.path.join(tmp, "assign")
    )
    meta = {
        "version": int(version),
        "cells": int(cells),
        "nprobe": int(nprobe),
        "dim": dim,
        "seed_ids": seed_ids,
        "folder_sigs": folder_sigs or {},
        "gen": gen,
    }
    # publish order: complete generation first, meta swap second — a
    # crash in between leaves an orphan gen (GC'd next publish) and
    # the previous index fully intact
    keep = retain_generations(meta, prev, rebuild=True)
    os.rename(tmp, os.path.join(index_dir, gen))
    publish_meta(index_dir, meta)
    legacy = ("assign", "centroids") if prev and prev.get("gen") else ()
    gc_generations(index_dir, keep, legacy)
    return meta


def refresh_ivf(
    spark: SparkSession,
    emb_changed: DataFrame | None,
    id_col: str,
    index_dir: str,
    version: int,
    changed: list[str],
    removed: list[str],
    folder_sigs: dict[str, str],
) -> dict:
    """Incremental catch-up against the EXISTING trained centroids:
    re-assign only ``changed`` folders' vectors (``emb_changed`` is
    the partition-pruned scan of exactly those folders), drop
    ``removed`` folders' partitions, leave every other folder's
    assignment files as untouched bytes — then pin the new table
    version + signatures. FAISS ``add``/``remove_ids`` without
    ``train``; only centroid QUALITY drifts until the next full
    build.

    If the refresh leaves no live vectors at all, the meta is removed
    so consumers take the exact-scan fallback (an assignment
    directory with zero part files would fail schema inference in
    naive readers and serve nothing correct in careful ones).

    The refresh NEVER mutates the published generation: fresh
    assignments for changed folders are written to a new generation
    dir, every unchanged folder's files are carried forward as
    hardlinks (O(1) IO each), centroids are linked unchanged, and the
    meta swap publishes the whole thing atomically — in-flight
    readers bound to the previous generation keep scoring against a
    complete, consistent index (see the generation-publishing note
    above ``table_root``)."""
    meta = read_meta(index_dir)
    if meta is None:
        raise ValueError(f"no index at {index_dir} to refresh")
    if not folder_sigs:
        # live set is empty: no index can serve it — signal fallback
        os.remove(os.path.join(index_dir, "meta.json"))
        return {"empty": True, "version": int(version)}

    cur_root = table_root(index_dir, meta)
    cur_assign = os.path.join(cur_root, "assign")
    # pre-(part,cell) layout (assignment partitioned by cell only,
    # meta without folder signatures): cell= dirs cannot mix with
    # part= dirs in one directory (Spark rejects 'Conflicting
    # directory structures'). An old meta pins no sigs, so the engine
    # marks EVERY folder changed — emb_changed already covers the
    # full live set — and nothing is carried forward.
    legacy_layout = any(
        e.startswith("cell=") for e in os.listdir(cur_assign)
    ) if os.path.isdir(cur_assign) else False
    prev_gen = meta.get("gen")
    prev_gens_before = list(meta.get("prev_gens", []))
    # capture the displaced generations' COST KINDS before the meta is
    # mutated — retention caps build-produced full copies separately
    prev_meta_before = {
        "gen": prev_gen,
        "prev_gens": prev_gens_before,
        "gen_kind": meta.get("gen_kind", "refresh"),
        "prev_gen_kinds": dict(meta.get("prev_gen_kinds", {}) or {}),
    }
    touched = sorted(set(changed) | set(removed))
    if touched or legacy_layout or not prev_gen:
        gen = new_gen_name()
        tmp = os.path.join(index_dir, f".tmp-{uuid.uuid4().hex[:8]}")
        written: set[str] = set()
        if changed and emb_changed is not None:
            dim = int(meta["dim"])
            cent = spark.read.parquet(os.path.join(cur_root, "centroids"))
            _assign(emb_changed, id_col, dim, cent).write.partitionBy(
                "part", "cell"
            ).parquet(os.path.join(tmp, "assign"))
            written = {
                e
                for e in os.listdir(os.path.join(tmp, "assign"))
                if e.startswith("part=")
            }
        os.makedirs(os.path.join(tmp, "assign"), exist_ok=True)
        # carry every untouched folder forward as hardlinks — same
        # bytes (the incremental contract), zero copy
        if os.path.isdir(cur_assign) and not legacy_layout:
            for e in os.listdir(cur_assign):
                if (
                    e.startswith("part=")
                    and unquote(e[len("part="):]) not in touched
                    and e not in written
                ):
                    link_tree(
                        os.path.join(cur_assign, e),
                        os.path.join(tmp, "assign", e),
                    )
        link_tree(
            os.path.join(cur_root, "centroids"), os.path.join(tmp, "centroids")
        )
        os.rename(tmp, os.path.join(index_dir, gen))
        meta["gen"] = gen
    meta["version"] = int(version)
    meta["folder_sigs"] = dict(folder_sigs)
    keep = retain_generations(meta, prev_meta_before)
    publish_meta(index_dir, meta)
    legacy = ("assign", "centroids") if prev_gen else ()
    gc_generations(index_dir, keep, legacy)
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


# --- generation publishing (shared by the vector + lexical indexes) ---
#
# Index tables live in IMMUTABLE generation dirs (g-<hex>/) under the
# index root; meta.json names the active one. A build/refresh writes a
# complete NEW generation (hardlinking unchanged files, so incremental
# cost stays O(changed folders)) and publishes it by atomically
# swapping the meta — it NEVER mutates a published generation. This is
# what makes refresh safe under concurrent readers: a search that
# validated freshness binds its plans to that generation's paths, and
# those paths stay intact through any number of later refreshes (the
# previous generation is retained one publish; only older ones are
# GC'd). The in-place per-folder swap this replaces could rmtree a
# partition out from under an in-flight scan (FileNotFound) or let a
# reader see NEW postings joined to OLD globals (silently wrong
# scores).

GEN_PREFIX = "g-"

#: displaced generations retained per index. One-publish retention
#: re-created the FILE_NOT_EXIST class one publish further out (the
#: round-5 advice finding): a lazy search plan bound via table_root()
#: to generation g0 survives ONE refresh, but a second refresh before
#: the caller collects would rmtree g0 and kill the scan. Retain the
#: last GEN_RETAIN displaced generations — the same age backstop the
#: corpus snapshot uses (_SNAP_MAX_AGE swaps) for the identical
#: failure class. REFRESH generations are hardlink-shared, so the
#: disk cost of refresh retention is one directory of links per
#: publish, not data copies. A REBUILD shares nothing with its
#: predecessors (it writes all-new data files), so BUILD-produced
#: displaced generations are full independent copies — retaining 8 of
#: those after repeated builds would cost up to ~9x index disk. The
#: cap is therefore per COST CLASS of each displaced generation (the
#: publish records its kind in the meta): refresh-displaced
#: generations keep the full GEN_RETAIN window (their chain shares
#: inodes — total disk ~one copy regardless of count), while
#: build-produced full copies cap at :data:`GEN_RETAIN_REBUILD` —
#: enough grace for the in-flight-reader class (a plan bound to the
#: displaced build survives its displacement plus one further
#: publish) without stockpiling independent copies.
GEN_RETAIN = 8
GEN_RETAIN_REBUILD = 2


def retain_generations(
    meta: dict, prev_meta: dict | None, rebuild: bool = False
) -> set[str]:
    """Record the displaced-generation retention list on ``meta``
    (``prev_gens``, newest first; refresh-kind generations capped at
    :data:`GEN_RETAIN`, build-kind full copies capped at
    :data:`GEN_RETAIN_REBUILD` — see the cost-class note above) and
    return the full keep-set for :func:`gc_generations`. The publish
    kind is persisted as ``gen_kind`` / per-retained-generation
    ``prev_gen_kinds`` so later publishes cap each displaced
    generation by what it COST, not by what displaced it (a rebuild
    must not evict the hardlink-cheap refresh chain an in-flight
    reader may still be bound to). Call BEFORE ``publish_meta`` so
    the retention list is persisted with the publish."""
    cur = meta.get("gen")
    displaced: list[str] = []
    kinds: dict[str, str] = {}
    if prev_meta:
        pg = prev_meta.get("gen")
        if pg and pg != cur:
            displaced.append(pg)
            kinds[pg] = prev_meta.get("gen_kind", "refresh")
        prev_kinds = prev_meta.get("prev_gen_kinds", {}) or {}
        for g in prev_meta.get("prev_gens", []):
            if g and g != cur and g not in displaced:
                displaced.append(g)
                kinds[g] = prev_kinds.get(g, "refresh")
    kept: list[str] = []
    full_copies = 0
    for g in displaced:  # newest first
        if len(kept) >= GEN_RETAIN:
            break
        if kinds.get(g) == "build":
            if full_copies >= GEN_RETAIN_REBUILD:
                continue  # stop stockpiling independent full copies
            full_copies += 1
        kept.append(g)
    meta["prev_gens"] = kept
    meta["prev_gen_kinds"] = {g: kinds.get(g, "refresh") for g in kept}
    meta["gen_kind"] = "build" if rebuild else "refresh"
    keep = set(kept)
    if cur:
        keep.add(cur)
    return keep


def table_root(index_dir: str, meta: dict | None = None) -> str:
    """Directory holding the index tables: the meta-named generation,
    or the index root itself for legacy pre-generation layouts (which
    refresh migrates on its first real change)."""
    if meta is None:
        meta = read_meta(index_dir)
    gen = (meta or {}).get("gen")
    return os.path.join(index_dir, gen) if gen else index_dir


def new_gen_name() -> str:
    return f"{GEN_PREFIX}{uuid.uuid4().hex[:8]}"


def publish_meta(index_dir: str, meta: dict) -> None:
    """Atomic meta swap (tmp + rename): readers see the old meta or
    the new one, never a torn write."""
    tmp = os.path.join(index_dir, f"meta.json.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        f.write(json.dumps(meta))
    os.replace(tmp, os.path.join(index_dir, "meta.json"))


def link_tree(src: str, dst: str) -> None:
    """Recursively hardlink ``src`` into ``dst`` — same bytes, zero
    copy: how a new generation carries every UNCHANGED folder's files
    forward at O(1) IO per file."""
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        tdir = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(tdir, exist_ok=True)
        for name in files:
            os.link(os.path.join(root, name), os.path.join(tdir, name))


def gc_generations(
    index_dir: str, keep: set[str], legacy_tables: tuple[str, ...] = ()
) -> None:
    """Prune generation dirs not in ``keep`` (plus crashed .tmp dirs).
    ``legacy_tables`` names root-level table dirs from the
    pre-generation layout — passed only once they are at least one
    publish old (so legacy in-flight readers get the same one-publish
    grace as generation readers)."""
    for e in list(os.listdir(index_dir)):
        p = os.path.join(index_dir, e)
        if e.startswith(GEN_PREFIX) and e not in keep and os.path.isdir(p):
            shutil.rmtree(p)
        elif ".tmp-" in e:
            (shutil.rmtree if os.path.isdir(p) else os.remove)(p)
    for t in legacy_tables:
        p = os.path.join(index_dir, t)
        if os.path.isdir(p):
            shutil.rmtree(p)


def file_identity(d: str) -> tuple:
    """The directory's parquet-file identity: sorted (name, size,
    mtime-ms) — pure os.stat, no Spark job. Part-file names carry
    write UUIDs, so ANY rewrite changes the identity. This is the ONE
    staleness primitive shared by the probe memo here and the
    engine's per-folder signatures (engine._folder_signatures) — keep
    them on the same definition or invalidation silently weakens."""
    return tuple(
        sorted(
            (f, os.path.getsize(os.path.join(d, f)),
             int(os.path.getmtime(os.path.join(d, f)) * 1000))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )
    )


#: probe-time centroid memo: index ROOT -> (centroid-files identity,
#: {cid: {d: c}}). Callers pass the GENERATION dir (table_root), but
#: the memo keys on the parent index root: a refresh carries the
#: centroid files into the new generation as HARDLINKS (same size,
#: same mtime), so file_identity matches and the memo stays warm
#: across refreshes with zero re-collects — keying on the generation
#: dir (the round-5 advice finding) cost one centroid re-collect per
#: refresh and left dead-generation entries behind. A rebuild writes
#: NEW centroid files, so the identity changes and invalidates the
#: memo for free. Bounded: dead stores' entries are pruned on insert,
#: and the memo hard-resets past _MEMO_CAP live stores (each entry is
#: a few KB; a long-lived driver serving many stores must not grow it
#: forever).
_CENTROID_MEMO: dict[str, tuple[tuple, dict[int, dict[int, float]]]] = {}
_MEMO_CAP = 64
#: The memo is module-global and probes run on SERVING threads — an
#: unguarded prune iterating the dict while a concurrent probe inserts
#: raises "dictionary changed size during iteration". This WAS the
#: long-unreproduced indexed-serving full-suite flake (rounds 5-6),
#: finally named by the loadtest error payloads. All memo access goes
#: through this lock; the guarded sections are dict ops plus a few
#: os.stat calls, never a Spark job.
_MEMO_LOCK = threading.Lock()


def _memo_key(index_dir: str) -> str:
    """Generation-stable memo key: the index root that owns the
    passed table root (generation dirs key to their parent)."""
    if os.path.basename(index_dir).startswith(GEN_PREFIX):
        return os.path.dirname(index_dir)
    return index_dir


def _centroids(spark: SparkSession, index_dir: str) -> dict[int, dict[int, float]]:
    ident = file_identity(os.path.join(index_dir, "centroids"))
    key = _memo_key(index_dir)
    with _MEMO_LOCK:
        memo = _CENTROID_MEMO.get(key)
    if memo is not None and memo[0] == ident:
        return memo[1]
    cents: dict[int, dict[int, float]] = {}
    for r in spark.read.parquet(os.path.join(index_dir, "centroids")).collect():
        cents.setdefault(int(r.cid), {})[int(r.sd)] = float(r.c)
    with _MEMO_LOCK:
        if key not in _CENTROID_MEMO:
            for stale in [k for k in list(_CENTROID_MEMO) if not os.path.isdir(k)]:
                del _CENTROID_MEMO[stale]
            if len(_CENTROID_MEMO) >= _MEMO_CAP:
                _CENTROID_MEMO.clear()
        _CENTROID_MEMO[key] = (ident, cents)
    return cents


def probe_cells(spark: SparkSession, index_dir: str, qvec: list[float], nprobe: int) -> list[int]:
    """The query's ``nprobe`` nearest cells, computed DRIVER-SIDE over
    the memoized k x dim centroid table (a few KB) with the same
    fixed-point arithmetic as the build — zero Spark jobs after the
    first probe of an index build (the memo key is the centroid
    files' identity, so rebuilds invalidate it for free)."""
    cents = _centroids(spark, index_dir)
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
    persisted assignment (explicit schema: an assignment that went
    empty must read as zero rows, not a schema-inference failure)."""
    return (
        spark.read.schema(_ASSIGN_SCHEMA)
        .parquet(os.path.join(index_dir, "assign"))
        .filter(F.col("cell").isin(cells))
        .select("id")
    )
