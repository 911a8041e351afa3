"""Markdown chunking (S1), re-embed (C9) and smart import (S5) tests."""

from __future__ import annotations

import pytest

from memories_spark.engine import MemoriesEngine
from memories_spark.extraction import mock_embed
from memories_spark.operators.chunking import chunk_markdown, chunk_markdown_df

NOW = "2024-06-01 12:00:00"
LATER = "2024-06-02 12:00:00"

MD = """# Title

First paragraph with enough characters to survive the filter.

Second paragraph, also long enough to be kept around.

## Section two

Third paragraph that belongs to the second section of the doc.
"""


def test_chunk_markdown_basic():
    chunks = chunk_markdown(MD, "docs/readme.md", max_chunk_size=200, overlap_size=40)
    assert all(len(t) <= 200 for t, _ in chunks)
    assert [s for _, s in chunks] == [f"docs/readme.md:chunk_{i}" for i in range(len(chunks))]
    joined = " ".join(t for t, _ in chunks)
    assert "First paragraph" in joined and "Third paragraph" in joined


def test_chunk_markdown_overlap_seeding():
    paras = "\n\n".join(f"paragraph number {i} " + "x" * 80 for i in range(6))
    chunks = chunk_markdown(paras, "s", max_chunk_size=150, overlap_size=30)
    assert len(chunks) >= 2
    for (prev, _), (nxt, _) in zip(chunks, chunks[1:]):
        # each continuation begins with the tail of its predecessor
        assert nxt.startswith(prev[-30:]) or len(prev) < 30


def test_chunk_markdown_drops_fragments():
    chunks = chunk_markdown("# H\n\ntiny", "s", min_chunk=30)
    assert chunks == []


def test_chunk_markdown_hard_wraps_long_paragraph():
    long_para = "y" * 500
    chunks = chunk_markdown(long_para, "s", max_chunk_size=150, overlap_size=20)
    assert all(len(t) <= 150 for t, _ in chunks)
    reassembled = chunks[0][0] + "".join(t[20:] for t, _ in chunks[1:])
    assert reassembled == long_para


def test_chunk_markdown_df(spark):
    docs = spark.createDataFrame(
        [(1, MD, "a.md"), (2, "# Only\n\nA single decent paragraph here.", "b.md")],
        "doc_id long, text string, source string",
    )
    out = chunk_markdown_df(docs, max_chunk_size=200, overlap_size=40).collect()
    assert {r.doc_id for r in out} == {1, 2}
    assert all(r.chunk_source.endswith(tuple(f":chunk_{i}" for i in range(10))) for r in out)


@pytest.fixture()
def engine(spark, tmp_path):
    eng = MemoriesEngine(spark, str(tmp_path / "store"))
    eng.add(
        [
            {"text": "the api uses port 7443", "source": "net",
             "embedding": mock_embed("the api uses port 7443")},
            {"text": "deploys run on fridays", "source": "ops",
             "embedding": mock_embed("deploys run on fridays")},
        ],
        NOW,
    )
    return eng


def test_rebuild_from_files_replaces_table(engine, tmp_path):
    md_a = tmp_path / "alpha.md"
    md_b = tmp_path / "beta.md"
    md_a.write_text(MD)
    md_b.write_text("# Beta\n\nA single decent paragraph for the beta file.")
    n = engine.rebuild_from_files([str(md_a), str(md_b)], LATER)
    rows = sorted(engine.table("memories").collect(), key=lambda r: r.id)
    # full rebuild: old rows gone, fresh ids from 0
    assert n == len(rows) and n >= 2
    assert [r.id for r in rows] == list(range(n))
    assert all(r.source.startswith(("alpha:chunk_", "beta:chunk_")) for r in rows)
    assert not any("port 7443" in r.text for r in rows)
    assert all(r.embedding is not None and len(r.embedding) > 0 for r in rows)
    # file order then chunk order: every alpha chunk precedes every beta chunk
    first_beta = min(r.id for r in rows if r.source.startswith("beta"))
    assert all(r.id < first_beta for r in rows if r.source.startswith("alpha"))


def test_reembed_rewrites_all(engine):
    n = engine.reembed(lambda t: mock_embed(t, dim=16))
    assert n == 2
    rows = engine.table("memories").collect()
    assert all(len(r.embedding) == 16 for r in rows)
    assert rows[0].embedding != rows[1].embedding


def test_import_smart_bands(engine):
    recs = [
        # exact duplicate -> skipped
        {"text": "the api uses port 7443", "source": "net",
         "embedding": mock_embed("the api uses port 7443")},
        # brand new -> added
        {"text": "completely unrelated zebra fact", "source": "zoo",
         "embedding": mock_embed("completely unrelated zebra fact")},
    ]
    s = engine.import_smart(recs, LATER)
    assert {k: s[k] for k in ("added", "skipped", "replaced")} == {
        "added": 1, "skipped": 1, "replaced": 0
    }
    assert [o["outcome"] for o in s["outcomes"]] == ["skipped_duplicate", "added"]
    assert engine.count() == 3


def test_import_smart_borderline_newer_wins(engine):
    # same words + one extra token lands in the borderline band
    rec = {"text": "the api uses port 7443 now", "source": "net",
           "embedding": mock_embed("the api uses port 7443 now"),
           "created_at": "2024-07-01 00:00:00"}
    s = engine.import_smart([rec], LATER)
    assert s["replaced"] == 1
    texts = {r.text for r in engine.table("memories").collect()}
    assert "the api uses port 7443 now" in texts
    assert "the api uses port 7443" not in texts


def test_import_smart_borderline_older_skipped(engine):
    rec = {"text": "the api uses port 7443 now", "source": "net",
           "embedding": mock_embed("the api uses port 7443 now"),
           "created_at": "2020-01-01 00:00:00"}
    s = engine.import_smart([rec], LATER)
    assert {k: s[k] for k in ("added", "skipped", "replaced")} == {
        "added": 0, "skipped": 1, "replaced": 0
    }
    assert s["outcomes"][0]["outcome"] == "skipped_older"
    texts = {r.text for r in engine.table("memories").collect()}
    assert "the api uses port 7443" in texts


def test_rebuild_plan_has_no_global_window(engine, tmp_path):
    """Id assignment in a rebuild must never funnel the corpus-sized
    chunk set through a single-partition sort: doc ids come from a
    driver-built path map, chunk ids from per-file offsets + a
    doc-PARTITIONED window (round-2 scale defect, fixed)."""
    md = tmp_path / "gamma.md"
    md.write_text(MD)
    rebuilt, chunks = engine._rebuild_plan([str(md)], LATER, mock_embed)
    p = rebuilt._jdf.queryExecution().explainString(
        rebuilt._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    chunks.unpersist()
    assert "Exchange SinglePartition" not in p, p
