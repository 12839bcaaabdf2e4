"""Tombstone soft-deletes + physical apply at compaction.

Reference semantics: DELETE /contents/<id> must make the doc vanish from
search (smse_backend/routes/content.py:232-255). Soft-delete keeps global
BM25 stats (Lucene's between-merges semantics) so survivor scores are
unchanged; compaction applies deletes physically and re-derives stats.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from smse_backend_spark.corpus import load_corpus
from smse_backend_spark.index import deletes
from smse_backend_spark.index.build import build_index, compact_index
from smse_backend_spark.index.query import InvertedIndex
from smse_backend_spark.operators.search import bm25_topk_scan

QUERIES = [
    ("hash join merge scan", None),
    ("window", None),
    ("batch stream spark window", "en"),
    ("the row data column", None),
]


@pytest.fixture(scope="module")
def corpus(spark, sf_smoke):
    c = load_corpus(spark, sf_smoke).cache()
    c.count()
    return c


@pytest.fixture(scope="module")
def soft_deleted(spark, corpus, tmp_path_factory):
    """Index over the full corpus with every 7th doc tombstoned."""
    out = str(tmp_path_factory.mktemp("idx_del"))
    build_index(spark, corpus, out, segment_size=64, n_buckets=4,
                block_size=16, n_batches=3)
    deletes.delete_docs(
        spark, out, corpus.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    )
    return out


def _expected_soft(corpus, q, lang, k=10):
    """Survivor top-k under FULL-corpus stats: scan-score everything,
    drop tombstoned docs, cut to k — scores must be unchanged."""
    rows = bm25_topk_scan(corpus, q, 100000, lang).collect()
    keep = [(r["doc_id"], r["score"]) for r in rows if r["doc_id"] % 7 != 0]
    return keep[:k]


def test_soft_delete_all_modes_exact(spark, corpus, soft_deleted):
    idx = InvertedIndex(spark, soft_deleted)
    for q, lang in QUERIES:
        want = _expected_soft(corpus, q, lang)
        for mode in ("exhaustive", "single_pass", "pruned"):
            got = [(r["doc_id"], r["score"])
                   for r in idx.bm25_topk(q, 10, lang, mode=mode).collect()]
            assert got == want, (q, mode, got[:3], want[:3])


def test_soft_delete_batch_kernel(spark, corpus, soft_deleted):
    idx = InvertedIndex(spark, soft_deleted)
    res = idx.bm25_topk_batch({i: q for i, (q, _l) in enumerate(QUERIES)}, 10)
    by_q = {}
    for r in res.collect():
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], r["score"]))
    for i, (q, _l) in enumerate(QUERIES):
        got = [(d, s) for _rk, d, s in sorted(by_q.get(i, []))]
        assert got == _expected_soft(corpus, q, None), q


def test_deleted_top_doc_vanishes(spark, corpus, tmp_path):
    out = str(tmp_path / "idx")
    build_index(spark, corpus, out, segment_size=64, n_buckets=4,
                block_size=16, n_batches=2)
    q = "hash join merge scan"
    before = [r["doc_id"] for r in
              InvertedIndex(spark, out).bm25_topk(q, 10).collect()]
    deletes.delete_docs(spark, out, [before[0]])
    after = InvertedIndex(spark, out).bm25_topk(q, 10).collect()
    assert before[0] not in {r["doc_id"] for r in after}
    assert after[0]["doc_id"] == before[1]


def test_delete_commits_accumulate_distinct(spark, corpus, tmp_path):
    out = str(tmp_path / "idx")
    build_index(spark, corpus.filter(F.col("doc_id") < 64), out,
                segment_size=64, n_buckets=4, block_size=16, n_batches=1)
    deletes.delete_docs(spark, out, [1, 2, 3])
    deletes.delete_docs(spark, out, [3, 4])  # overlap across commits
    assert deletes.committed_deletes(out) == [0, 1]
    assert deletes.tombstone_count(out) == 5  # per-commit sums (upper bound)
    got = sorted(r["doc_id"] for r in deletes.read_tombstones(spark, out).collect())
    assert got == [1, 2, 3, 4]
    arr = deletes.tombstone_array(spark, out, cap=10)
    assert list(arr) == [1, 2, 3, 4]
    assert deletes.tombstone_array(spark, out, cap=3) is None  # over cap


def test_big_tombstone_set_falls_back_to_join(spark, corpus, soft_deleted,
                                              monkeypatch):
    monkeypatch.setattr(InvertedIndex, "TOMB_ARRAY_CAP", 0)
    idx = InvertedIndex(spark, soft_deleted)
    q, lang = QUERIES[0]
    want = _expected_soft(corpus, q, lang)
    # single_pass silently reroutes to the join-based exhaustive path
    got = [(r["doc_id"], r["score"])
           for r in idx.bm25_topk(q, 10, lang, mode="single_pass").collect()]
    assert got == want
    with pytest.raises(ValueError, match="compact_index"):
        idx.bm25_topk_batch({0: q}, 10)


def test_compact_applies_tombstones(spark, corpus, soft_deleted, tmp_path):
    dst = str(tmp_path / "compacted")
    meta = compact_index(spark, soft_deleted, dst)
    survivors = corpus.filter(F.col("doc_id") % 7 != 0).cache()
    n_live = survivors.count()
    assert meta["n_docs"] == n_live
    assert deletes.committed_deletes(dst) == []  # compacted index is clean
    from smse_backend_spark.index import lineage as lin

    assert lin.read_lineage(dst)[0]["tombstones_applied"] > 0
    # post-compaction stats are EXACT for the smaller corpus: queries are
    # rank- and score-identical to a scan over the filtered corpus
    idx = InvertedIndex(spark, dst)
    for q, lang in QUERIES:
        got = [(r["doc_id"], r["score"]) for r in idx.bm25_topk(q, 10, lang).collect()]
        want = [(r["doc_id"], r["score"])
                for r in bm25_topk_scan(survivors, q, 10, lang).collect()]
        assert got == want, (q, got[:3], want[:3])
    survivors.unpersist()


def test_compact_applies_tombstones_positional(spark, corpus, tmp_path):
    """Physical-delete compaction on a POSITIONAL index: poss blobs are
    decoded, survivors' offset lists pass through, and phrase queries on
    the compacted index are rank- and score-identical to a fresh
    positional build over the filtered corpus."""
    src, dst = str(tmp_path / "pos_src"), str(tmp_path / "pos_dst")
    build_index(spark, corpus, src, segment_size=64, n_buckets=4,
                block_size=16, n_batches=2, with_positions=True)
    deletes.delete_docs(
        spark, src, corpus.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    )
    meta = compact_index(spark, src, dst)
    survivors = corpus.filter(F.col("doc_id") % 5 != 0).cache()
    assert meta["n_docs"] == survivors.count()
    assert meta["config"]["with_positions"] is True

    ref = str(tmp_path / "pos_ref")
    build_index(spark, survivors, ref, segment_size=64, n_buckets=4,
                block_size=16, n_batches=1, with_positions=True)
    idx, ridx = InvertedIndex(spark, dst), InvertedIndex(spark, ref)
    for phrase in ["table scan", "hash join", "merge sort"]:
        got = [(r["doc_id"], r["score"])
               for r in idx.phrase_topk(phrase, 10).collect()]
        want = [(r["doc_id"], r["score"])
                for r in ridx.phrase_topk(phrase, 10).collect()]
        assert got == want, (phrase, got[:3], want[:3])
    # ordinary term queries re-derive exact survivor stats too
    for q, lang in QUERIES[:2]:
        got = [(r["doc_id"], r["score"]) for r in idx.bm25_topk(q, 10, lang).collect()]
        want = [(r["doc_id"], r["score"])
                for r in bm25_topk_scan(survivors, q, 10, lang).collect()]
        assert got == want, (q, got[:3], want[:3])
    survivors.unpersist()


def test_replace_docs_update_flow(spark, corpus, tmp_path):
    """Re-crawled file: old doc_id tombstoned, new version indexed above
    the frontier — queries see exactly one (the new) version."""
    out = str(tmp_path / "idx")
    build_index(spark, corpus, out, segment_size=64, n_buckets=4,
                block_size=16, n_batches=2)
    q = "hash join merge scan"
    top = InvertedIndex(spark, out).bm25_topk(q, 5).collect()
    old_id = top[0]["doc_id"]
    old_row = corpus.filter(F.col("doc_id") == old_id).first()

    new_id = 1000  # above the indexed frontier (8 segments x 64 = 512)
    new_docs = spark.createDataFrame(
        [(new_id, old_row["lang"], old_row["content"] + " freshly recrawled")],
        "doc_id long, lang string, content string",
    )
    meta = deletes.replace_docs(spark, out, new_docs, [old_id],
                                snapshot_id="recrawl-1")
    assert meta["n_docs"] == 501  # soft-deleted old still counts until merge

    got = InvertedIndex(spark, out).bm25_topk(q, 10).collect()
    ids = {r["doc_id"] for r in got}
    assert old_id not in ids
    assert new_id in ids  # near-identical content must re-rank into top-10


def test_tombstone_filter_plan_is_broadcast_anti_join(spark, soft_deleted):
    """PLANS.md §7 claim: with a small tombstone set, the exhaustive decode
    path filters via a broadcast left-anti hash join (no shuffled join)."""
    idx = InvertedIndex(spark, soft_deleted)
    df = idx.bm25_topk("hash join merge scan", 10, mode="exhaustive")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:2000]


def test_upsert_lifecycle_delete_plus_add(spark, sf_smoke, tmp_path):
    """ES update semantics (Lucene delete+add): after tombstoning the old
    versions and extending with re-written content under fresh ids, search
    must (a) never return an old version, (b) surface updated docs on the
    terms their new content added, (c) keep stats Lucene-style (old
    versions still count until compaction)."""
    from pyspark.sql import functions as F

    from smse_backend_spark.corpus import load_corpus
    from smse_backend_spark.index.build import build_index, extend_index
    from smse_backend_spark.index.deletes import delete_docs
    from smse_backend_spark.index.query import InvertedIndex

    out = str(tmp_path / "upsert")
    base = load_corpus(spark, sf_smoke).filter(F.col("doc_id") < 512)
    build_index(spark, base, out, segment_size=256, n_buckets=8,
                block_size=64, n_batches=2)
    old_ids = list(range(3, 512, 10))
    upd = (
        base.filter(F.col("doc_id") % 10 == 3)
        .withColumn("doc_id", F.col("doc_id") + 512)
        .withColumn(
            "content",
            F.concat(F.col("content"), F.lit(" zzupsertmarker zzupsertmarker")),
        )
        .withColumn("content_sha256", F.sha2(F.col("content"), 256))
    )
    delete_docs(spark, out, old_ids)
    extend_index(spark, upd, out)
    idx = InvertedIndex(spark, out)

    hits = idx.bm25_topk("zzupsertmarker", 10).collect()
    assert len(hits) == 10
    assert all(r["doc_id"] >= 512 for r in hits)  # only new versions match
    # a generic query never returns a tombstoned old version
    generic = idx.bm25_topk("hash join merge scan", 20).collect()
    assert not ({r["doc_id"] for r in generic} & set(old_ids))
    # Lucene stat semantics: n_docs counts old versions until compaction
    n, _ = idx.corpus_stats()
    n_base = base.count()
    n_updated = base.filter(F.col("doc_id") % 10 == 3).count()
    assert n == n_base + n_updated


def test_delete_by_query_lifecycle(spark, sf_smoke, tmp_path):
    """ES _delete_by_query: the query's whole match set is tombstoned in
    one DataFrame-driven commit; matching docs vanish from every query,
    stats keep counting them (Lucene soft semantics)."""
    from pyspark.sql import functions as F

    from smse_backend_spark.corpus import load_corpus
    from smse_backend_spark.index.build import build_index
    from smse_backend_spark.index.query import InvertedIndex

    out = str(tmp_path / "dbq")
    base = load_corpus(spark, sf_smoke).filter(F.col("doc_id") < 512)
    build_index(spark, base, out, segment_size=256, n_buckets=8,
                block_size=64, n_batches=2)
    idx = InvertedIndex(spark, out)
    victims = {r["doc_id"] for r in idx.match_doc_ids("window").collect()}
    assert victims
    row = idx.delete_by_query("window")
    assert row["n_deleted"] == len(victims)
    # matching docs are gone from the deleting query and any other query
    assert idx.count_matches("window").first()["n_hits"] == 0
    survivors = {r["doc_id"]
                 for r in idx.bm25_topk("hash join merge scan", 1000).collect()}
    assert survivors and not (survivors & victims)
    # Lucene soft-delete stats: n unchanged until compaction
    n, _ = idx.corpus_stats()
    assert n == base.count()
