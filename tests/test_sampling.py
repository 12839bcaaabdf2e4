"""Hash split / hash sample / KMV distinct sketch."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from smse_backend_spark.operators.sampling import (
    TWO60,
    corpus_sample,
    corpus_sample_sql,
    hash_split,
    hash_split_sql,
    kmv_distinct,
    kmv_distinct_sql,
)


@pytest.fixture(scope="module")
def con(sf_smoke):
    c = duckdb.connect()
    for t in ("documents", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_smoke}/{t}.parquet'")
    return c


def test_hash_split_matches_duckdb_and_is_total(spark, sf_smoke, con):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    got = sorted(map(tuple, hash_split(docs).collect()))
    want = sorted(map(tuple, con.execute(hash_split_sql()).fetchall()))
    assert got == want
    splits = [s for _, s in got]
    assert set(splits) == {"train", "val", "test"}
    # roughly 80/10/10 (loose bound at smoke scale)
    assert splits.count("train") / len(splits) > 0.6


def test_hash_split_stable_under_growth(spark, sf_smoke, sf_correct):
    """Adding docs never reassigns existing ones (same ids, same split)."""
    small = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            spark.read.parquet(f"{sf_smoke}/documents.parquet")
        ).collect()
    }
    big = {
        r["doc_id"]: r["split"]
        for r in hash_split(
            spark.read.parquet(f"{sf_correct}/documents.parquet")
        ).collect()
    }
    assert small == {d: big[d] for d in small}


def test_corpus_sample_matches_duckdb(spark, sf_smoke, con):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    got = sorted(map(tuple, corpus_sample(docs, 0.1).collect()))
    want = sorted(map(tuple, con.execute(corpus_sample_sql(0.1)).fetchall()))
    assert got == want
    n = docs.count()
    assert 0 < len(got) < n / 2  # ~10%


def test_kmv_matches_duckdb_and_estimates(spark, sf_smoke, con):
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    got = sorted(map(tuple, kmv_distinct(ev, "user_id", "event_type", 8).collect()))
    want = sorted(
        map(tuple, con.execute(kmv_distinct_sql("user_id", "event_type", 8)).fetchall())
    )
    assert got == want and len(got) > 0
    for _, n_exact, est in got:
        # KMV with k=8 has ~35% relative stddev; allow a generous band
        assert est == pytest.approx(n_exact, rel=1.5)


def test_kmv_below_capacity_is_exact(spark):
    ev = spark.createDataFrame(
        [(i, "t") for i in range(5)] * 3, "user_id long, event_type string"
    )
    rows = kmv_distinct(ev, "user_id", "event_type", 64).collect()
    assert len(rows) == 1
    assert rows[0]["n_exact"] == 5 and rows[0]["estimate"] == 5.0


def test_kmv_merge_property(spark, sf_smoke):
    """Sketch of the union == union of sketches: the k smallest hashes of
    A ∪ B are a subset of (k smallest of A) ∪ (k smallest of B)."""
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    k = 8
    full = {
        r["event_type"]: r["estimate"]
        for r in kmv_distinct(ev, "user_id", "event_type", k).collect()
    }
    merged = {
        r["event_type"]: r["estimate"]
        for r in kmv_distinct(
            half_a.unionByName(half_b), "user_id", "event_type", k
        ).collect()
    }
    assert full == merged


def test_pack_chunks_semantics(spark, sf_smoke, con):
    """Packing: per-lang bins fill contiguously; offsets are consistent
    with an exclusive running sum; DuckDB twin matches exactly."""
    from smse_backend_spark.corpus import load_corpus
    from smse_backend_spark.operators.chunking import (
        pack_chunks,
        pack_chunks_sql,
    )

    got = sorted(map(tuple, pack_chunks(
        load_corpus(spark, sf_smoke), 32, 8, 256
    ).collect()))
    want = sorted(map(tuple, con.execute(pack_chunks_sql(32, 8, 256)).fetchall()))
    assert got == want and len(got) > 0
    # replay the packer per lang in python
    from collections import defaultdict
    by_lang = defaultdict(list)
    for lang, doc_id, chunk_id, n_tok, bin_id, off, straddles in got:
        by_lang[lang].append((doc_id, chunk_id, n_tok, bin_id, off, straddles))
    crossed = 0
    for lang, rows in by_lang.items():
        rows.sort()
        cum = 0
        for doc_id, chunk_id, n_tok, bin_id, off, straddles in rows:
            assert bin_id == cum // 256 and off == cum % 256
            assert straddles == (off + n_tok > 256)
            crossed += straddles
            cum += n_tok
    assert crossed > 0  # fixture actually exercises the straddle path


def test_stratified_sample_dist_bit_identical(spark, sf_smoke):
    """Threshold-prefiltered quota sample == the full-window one, and the
    deliberately-undersized safety factor exercises the doubling loop
    while staying exact."""
    from smse_backend_spark.operators.sampling import (
        _bounded_group_rank,
        hash_u60,
        stratified_sample,
        stratified_sample_dist,
        STRATA_SALT,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    want = sorted(map(tuple, stratified_sample(docs, 20).collect()))
    got = sorted(map(tuple, stratified_sample_dist(docs, 20).collect()))
    assert got == want and len(want) > 0
    # safety=1: expected survivors == k, so some group almost surely
    # comes up short and the threshold-doubling loop must run — output
    # must still be exact
    d = docs.select(
        "lang", hash_u60(F.col("doc_id"), STRATA_SALT).alias("h"), "doc_id"
    )
    tight = sorted(
        (r["doc_id"], r["lang"])
        for r in _bounded_group_rank(d, "lang", 20, safety=1)
        .select("doc_id", "lang").collect()
    )
    assert tight == want


def test_kmv_distinct_dist_bit_identical(spark, sf_smoke):
    from smse_backend_spark.operators.sampling import (
        kmv_distinct,
        kmv_distinct_dist,
    )

    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    want = sorted(map(tuple, kmv_distinct(ev, "user_id", "event_type", 64).collect()))
    got = sorted(map(tuple, kmv_distinct_dist(ev, "user_id", "event_type", 64).collect()))
    assert got == want and len(want) > 0


def test_bounded_group_rank_window_is_post_filter(spark, sf_smoke):
    """The rank window must run on the threshold SURVIVORS (its input is
    the broadcast-thresholds join), not on the raw group stream."""
    from smse_backend_spark.operators.sampling import stratified_sample_dist

    df = stratified_sample_dist(
        spark.read.parquet(f"{sf_smoke}/documents.parquet"), 20
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    win_at = plan.index("windowspecdefinition")
    assert "BroadcastHashJoin" in plan[win_at:], (
        "window input lost the threshold pre-filter join"
    )


def test_pack_chunks_dist_bit_identical(spark, sf_smoke):
    """The two-pass distributed packer == the single-window packer, bit
    for bit, across several group counts (incl. n_groups=1 — degenerate
    single block — and a count far above the doc count)."""
    from smse_backend_spark.corpus import load_corpus
    from smse_backend_spark.operators.chunking import (
        pack_chunks,
        pack_chunks_dist,
    )

    corpus = load_corpus(spark, sf_smoke)
    want = sorted(map(tuple, pack_chunks(corpus, 32, 8, 256).collect()))
    assert len(want) > 0
    for n_groups in (1, 7, 64, 100_000):
        got = sorted(
            map(tuple, pack_chunks_dist(corpus, 32, 8, 256, n_groups).collect())
        )
        assert got == want, f"n_groups={n_groups} diverges"


def test_pack_chunks_dist_parallel_plan(spark, sf_smoke):
    """The heavy window must shuffle on (lang, g) — n_groups-way parallel
    — never on lang alone (one task per language is the bottleneck this
    operator exists to remove)."""
    from smse_backend_spark.corpus import load_corpus
    from smse_backend_spark.operators.chunking import pack_chunks_dist

    df = pack_chunks_dist(load_corpus(spark, sf_smoke), 32, 8, 256, 64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the heavy window (the one ordered by doc_id, chunk_id — the row-level
    # running sum) must partition on (lang, g); the physical plan renames
    # its output to _weN, so identify it by its ordering keys
    local_win = [ln for ln in plan.splitlines()
                 if "windowspecdefinition" in ln
                 and "doc_id#" in ln and "chunk_id#" in ln]
    assert local_win, "local window node not found in plan"
    assert all("g#" in ln for ln in local_win), (
        "heavy window lost its g key — serial per-language scan is back"
    )
    # the offsets frame joins back as a broadcast, never a shuffle join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_value_percentiles_exact_parity(spark, sf_smoke, con):
    from smse_backend_spark.operators.aggregations import (
        value_percentiles,
        value_percentiles_sql,
    )

    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    got = sorted(map(tuple, value_percentiles(ev).collect()))
    want = sorted(map(tuple, con.execute(value_percentiles_sql()).fetchall()))
    assert got == want and len(got) > 0
    for row in got:
        n, p25, p50, p90, p99 = row[1:]
        assert p25 <= p50 <= p90 <= p99 and n > 0


def test_curation_pipeline_composes_stages(spark, sf_smoke, con):
    """Pipeline == manually chaining the stage operators; SQL twin exact."""
    from smse_backend_spark.corpus import load_corpus
    from smse_backend_spark.operators.chunking import (
        curation_pipeline,
        curation_pipeline_sql,
        pack_chunks,
    )
    from smse_backend_spark.operators.dedup import dedup_exact
    from smse_backend_spark.operators.sampling import hash_split

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    got = sorted(map(tuple, curation_pipeline(docs, 32, 8, 256).collect()))
    want = sorted(
        map(tuple, con.execute(curation_pipeline_sql(32, 8, 256)).fetchall())
    )
    assert got == want and len(got) > 0
    # manual chain
    surv = {r["doc_id"] for r in dedup_exact(docs).collect()}
    tr = {
        r["doc_id"]
        for r in hash_split(docs).collect()
        if r["split"] == "train"
    }
    keep_ids = surv & tr
    kept = docs.filter(F.col("doc_id").isin(list(keep_ids))).select(
        "doc_id", "lang", F.col("text").alias("content")
    )
    manual = sorted(map(tuple, pack_chunks(kept, 32, 8, 256).collect()))
    assert got == manual
    assert {r[1] for r in got} == {d for d in keep_ids
                                   if d in {r[1] for r in got}}


def test_quality_weighted_sample_matches_duckdb(spark, sf_smoke, con):
    from smse_backend_spark.operators.sampling import (
        quality_weighted_sample,
        quality_weighted_sample_sql,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    got = sorted(map(tuple, quality_weighted_sample(docs).collect()))
    want = sorted(map(tuple, con.execute(quality_weighted_sample_sql()).fetchall()))
    assert got == want and len(got) > 0
    # mixture property: keep-rate rises with the bucket (checked against
    # the full per-bucket population, loose bounds at smoke scale)
    from smse_backend_spark.functions.text_quality import quality_scores

    pop = (
        quality_scores(docs)
        .select(
            F.least(F.floor(F.col("quality") * 5).cast("long"), F.lit(4))
            .alias("bucket")
        )
        .groupBy("bucket").count().collect()
    )
    pop_by = {r["bucket"]: r["count"] for r in pop}
    kept_by: dict[int, int] = {}
    for _d, b, _q in got:
        kept_by[b] = kept_by.get(b, 0) + 1
    # top bucket keeps everything (rate 1.0)
    if 4 in pop_by:
        assert kept_by.get(4, 0) == pop_by[4]
    # bottom bucket keeps far less than the top, when populated enough
    if pop_by.get(0, 0) >= 50:
        assert kept_by.get(0, 0) / pop_by[0] < 0.2


def test_quality_weighted_sample_stable_under_growth(spark, sf_smoke):
    from smse_backend_spark.operators.sampling import quality_weighted_sample

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    full = {r["doc_id"] for r in quality_weighted_sample(docs).collect()}
    half_docs = docs.filter(F.col("doc_id") < 250)
    half = {r["doc_id"] for r in quality_weighted_sample(half_docs).collect()}
    # membership decisions are per-row: the subset's picks are exactly the
    # full run's picks restricted to the subset
    assert half == {d for d in full if d < 250}


def test_mixture_plan_matches_duckdb_and_mixture_law(spark, sf_smoke, con):
    from smse_backend_spark.operators.sampling import (
        default_mixture_targets,
        mixture_plan,
        mixture_plan_sql,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    targets = default_mixture_targets()
    got = [tuple(r) for r in mixture_plan(docs, targets).collect()]
    want = [tuple(r) for r in con.execute(mixture_plan_sql(targets)).fetchall()]
    assert got == want and len(got) == 20
    # max-retention law: exactly >=1 binding source at rate 1.0, all rates in (0, 1]
    rates = {r[0]: r[3] for r in got}
    assert max(rates.values()) == 1.0 and min(rates.values()) > 0
    # realized tokens track the targets: for non-binding sources,
    # plan_tokens/target is constant (= C) within quantization slack
    ratios = [r[4] / targets[r[0]] for r in got if r[3] < 1.0]
    # plan_tokens floors to whole tokens, so each ratio may deviate by up
    # to ~1/w plus the 1e-6 rate quantization
    slack = 2.0 / min(targets.values()) + 1e-6 * max(r[2] for r in got)
    assert ratios and (max(ratios) - min(ratios)) <= slack


def test_dsir_select_vs_duckdb_and_semantics(spark, sf_smoke, con):
    """DSIR importance weights == DuckDB twin; target-domain docs (en)
    dominate the top of the selection (that's the whole point)."""
    from smse_backend_spark.operators.sampling import (
        dsir_select,
        dsir_select_sql,
    )

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    got = sorted(map(tuple, dsir_select(docs, "en", 64, 50).collect()))
    want = sorted(map(tuple, con.execute(
        dsir_select_sql("en", 64, 50)).fetchall()))
    assert got == want and got
    # semantics: among the selected docs, the en share exceeds the
    # corpus-wide en share (importance weights favor the target domain)
    top_ids = [doc_id for doc_id, _w in got]
    langs = {r["doc_id"]: r["lang"] for r in docs.collect()}
    sel_en = sum(1 for d in top_ids if langs[d] == "en") / len(top_ids)
    all_en = sum(1 for v in langs.values() if v == "en") / len(langs)
    assert sel_en > all_en
    # weights are finite and the ranking is (logw desc, doc_id asc)
    rows = dsir_select(docs, "en", 64, 50).collect()
    ws = [(r["logw"], -r["doc_id"]) for r in rows]
    assert ws == sorted(ws, key=lambda t: (-t[0], -t[1]))
