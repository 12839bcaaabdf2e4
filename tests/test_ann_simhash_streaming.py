"""ANN (brute force + LSH recall), SimHash vs python oracle, streaming."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from smse_backend_spark.operators.ann import brute_force_topk, lsh_topk
from smse_backend_spark.operators.simhash import (
    simhash_neardup_pairs,
    simhash_py,
    simhash_signatures,
)


@pytest.fixture(scope="module")
def emb(spark, sf_smoke):
    e = spark.read.parquet(f"{sf_smoke}/embeddings.parquet").cache()
    e.count()
    return e


@pytest.fixture(scope="module")
def queries(emb):
    rows = emb.filter(F.col("vec_id").isin([0, 1, 2])).collect()
    return {r["vec_id"]: [float(x) for x in r["embedding"]] for r in rows}


def test_brute_force_matches_numpy(emb, queries):
    all_rows = emb.collect()
    ids = np.array([r["vec_id"] for r in all_rows])
    mat = np.array([r["embedding"] for r in all_rows], dtype=np.float64)
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)

    got = brute_force_topk(emb, queries, k=10).collect()
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["score"]))
    for qid, qv in queries.items():
        qn = np.array(qv) / np.linalg.norm(qv)
        sims = np.round(mat_n @ qn, 6)
        order = np.lexsort((ids, -sims))[:10]
        want = [(int(ids[i]), float(sims[i])) for i in order]
        assert by_q[qid] == want


def test_lsh_recall_at_10(emb, queries):
    """Uniform random vectors are the worst case for hyperplane LSH (top
    hits sit at cosine ~0.3, barely off-orthogonal); 4 planes x 16 tables
    still must recover most of the exact top-10. Clustered real-world
    embedding distributions do far better at the same cost."""
    exact = brute_force_topk(emb, queries, k=10).collect()
    approx = lsh_topk(emb, queries, k=10, n_planes=4, n_tables=16).collect()
    e = {(r["query_id"], r["vec_id"]) for r in exact}
    a = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(e & a) / len(e)
    assert recall >= 0.7, f"LSH recall@10 too low: {recall}"


def test_lsh_scores_are_exact_on_candidates(emb, queries):
    """LSH may miss candidates but must never mis-score one."""
    exact = {
        (r["query_id"], r["vec_id"]): r["score"]
        for r in brute_force_topk(emb, queries, k=500).collect()
    }
    for r in lsh_topk(emb, queries, k=10, n_planes=6, n_tables=8).collect():
        assert exact[(r["query_id"], r["vec_id"])] == pytest.approx(r["score"], abs=1e-9)


def test_simhash_matches_python_oracle(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(50)
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    for doc_id, text in rows.items():
        want = simhash_py(text)
        assert got[doc_id] & 0xFFFFFFFFFFFFFFFF == want, f"doc {doc_id}"


def test_simhash_neardup_exact_on_bands(spark):
    """Identical docs -> hamming 0; banding must surface them."""
    rows = [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
            (3, "completely different words entirely unrelated content here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_neardup_pairs(docs, max_hamming=3).collect()}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_streaming_rollup_matches_batch(spark, sf_smoke, tmp_path):
    """Structured-streaming windowed rollup == the batch operator."""
    from smse_backend_spark.operators.relational import hourly_event_rollup
    from smse_backend_spark.streaming.events import windowed_event_rollup

    import shutil

    src = tmp_path / "events_src"
    src.mkdir()
    shutil.copy(f"{sf_smoke}/events.parquet", src / "part-0.parquet")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    windowed_event_rollup(spark, str(src), out, ckpt)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    # append mode only emits windows the watermark has closed: windows whose
    # end > max(ts) - 2h stay in state at AvailableNow drain — exclude them
    # from the batch side (this IS the late-data semantics under test)
    max_ts = spark.read.parquet(f"{sf_smoke}/events.parquet").agg(
        F.max(F.col("ts").cast("timestamp"))
    ).first()[0]
    want_df = (
        hourly_event_rollup(spark, sf_smoke)
        .withColumn("hour", F.col("hour").cast("timestamp"))
        .filter(
            F.col("hour") + F.expr("INTERVAL 1 HOUR")
            <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
        )
    )
    want = sorted(map(tuple, want_df.collect()))
    assert got == want and len(got) > 0


def test_streaming_ingest_checkpoint_resume(spark, sf_smoke, tmp_path):
    """Second AvailableNow drain over the same source adds nothing (task dedup)."""
    from smse_backend_spark.streaming.events import incremental_ingest

    import shutil

    src = tmp_path / "docs_src"
    src.mkdir()
    shutil.copy(f"{sf_smoke}/documents.parquet", src / "part-0.parquet")
    out, ckpt = str(tmp_path / "docs_out"), str(tmp_path / "docs_ckpt")
    incremental_ingest(spark, str(src), out, ckpt)
    n1 = spark.read.parquet(out).count()
    incremental_ingest(spark, str(src), out, ckpt)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 == 500


def test_sessionize_matches_batch_oracle(spark, sf_smoke, tmp_path):
    """applyInPandasWithState gap sessions == lag-based batch sessionization
    (DuckDB), including the last-session watermark-timeout boundary."""
    import duckdb

    from smse_backend_spark.streaming.sessions import (
        sessionized_events_df,
        sessionized_events_sql,
    )

    got = sorted(map(tuple, sessionized_events_df(
        spark, sf_smoke, str(tmp_path / "sess")
    ).collect()))
    con = duckdb.connect()
    con.execute(
        f"create view events as select * from '{sf_smoke}/events.parquet'"
    )
    want = sorted(map(tuple, con.execute(sessionized_events_sql()).fetchall()))
    assert len(got) > 0 and got == want


def test_sessionize_handles_multi_session_batches(spark, tmp_path):
    """One key with 3 gap-separated bursts in a single micro-batch: the two
    closed-by-data sessions emit; the open one is held back (watermark never
    passes it)."""
    import shutil

    from pyspark.sql import functions as F

    from smse_backend_spark.streaming.sessions import sessionize

    rows = [
        # burst 1: 2 events, burst 2: 1 event, burst 3 (open): 2 events
        (1, "2024-01-01 00:00:00", 7, "view", 1.0, "{}"),
        (2, "2024-01-01 00:10:00", 7, "view", 2.0, "{}"),
        (3, "2024-01-01 02:00:00", 7, "view", 4.0, "{}"),
        (4, "2024-01-01 05:00:00", 7, "view", 8.0, "{}"),
        (5, "2024-01-01 05:20:00", 7, "view", 16.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    src = tmp_path / "src"
    src.mkdir()
    df.coalesce(1).write.parquet(str(src / "p"))
    for f in (src / "p").glob("*.parquet"):
        shutil.move(str(f), src / "part-0.parquet")
    shutil.rmtree(src / "p")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    sessionize(spark, str(src), out, ckpt, gap_minutes=30, watermark="2 hours")
    got = sorted(
        map(tuple, spark.read.parquet(out).select(
            "user_id", "n_events", "total_value").collect())
    )
    # burst 3 stays open: final watermark = 05:20 - 2h < 05:20 + 30m
    assert got == [(7, 1, 4.0), (7, 2, 3.0)]


def test_sessionize_out_of_order_across_batches(spark, tmp_path):
    """An event arriving in a LATER micro-batch with ts < the open state's
    last event (legal inside the watermark) must merge into the open
    session without shrinking session_end or re-splitting it."""
    import shutil

    from pyspark.sql import functions as F

    from smse_backend_spark.streaming.sessions import sessionize

    def write(rows, name):
        df = spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        df.coalesce(1).write.parquet(str(tmp_path / "stage"))
        part = next((tmp_path / "stage").glob("*.parquet"))
        shutil.move(str(part), src / name)
        shutil.rmtree(tmp_path / "stage")

    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    # batch 1: open session [00:00, 00:10]
    write([(1, "2024-01-01 00:00:00", 7, "view", 1.0, "{}"),
           (2, "2024-01-01 00:10:00", 7, "view", 2.0, "{}")], "part-0.parquet")
    sessionize(spark, str(src), out, ckpt, gap_minutes=30, watermark="2 hours")
    # batch 2: one OUT-OF-ORDER event inside the open span (00:05) and one
    # event 50 min after its end (01:00) that closes it by data
    write([(3, "2024-01-01 00:05:00", 7, "view", 4.0, "{}"),
           (4, "2024-01-01 01:00:00", 7, "view", 8.0, "{}")], "part-1.parquet")
    sessionize(spark, str(src), out, ckpt, gap_minutes=30, watermark="2 hours")
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert len(got) == 1
    user_id, start, end, n, total = got[0]
    # the closed session keeps end 00:10 (NOT shrunk to 00:05) and absorbs
    # the late event: 3 events, total 7.0
    assert (user_id, str(start), str(end), n, total) == (
        7, "2024-01-01 00:00:00", "2024-01-01 00:10:00", 3, 7.0
    )


def test_sq8_vs_duckdb_and_recall(spark, sf_smoke):
    """Quantized ANN == its SQL twin exactly; quantization costs little
    recall vs full-precision brute force on the synthetic embeddings."""
    import duckdb

    from smse_backend_spark.operators.ann import (
        brute_force_topk,
        sq8_topk,
        sq8_topk_sql,
    )

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    qvecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter("vec_id in (0, 1, 2)").collect()
    }
    got = [tuple(r) for r in sq8_topk(emb, qvecs, 10).collect()]
    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from '{sf_smoke}/embeddings.parquet'"
    )
    want = [tuple(w) for w in con.execute(sq8_topk_sql([0, 1, 2], 10)).fetchall()]
    assert sorted(got) == sorted(want)

    exact = brute_force_topk(emb, qvecs, 10).collect()
    by_q_exact = {}
    for r in exact:
        by_q_exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    by_q_sq8 = {}
    for qid, _rank, vid, _s in got:
        by_q_sq8.setdefault(qid, set()).add(vid)
    for qid, ex in by_q_exact.items():
        assert len(by_q_sq8[qid] & ex) >= 8, (qid, by_q_sq8[qid], ex)


def test_pq_vs_duckdb_and_recall(spark, sf_smoke):
    """Product-quantized ANN == its SQL twin exactly; every reconstructed
    vector is a concatenation of codebook slices; PQ at m=4/ks=16 keeps
    reasonable recall@10 vs full precision on the synthetic embeddings."""
    import duckdb

    from smse_backend_spark.operators.ann import (
        brute_force_topk,
        pq_codebooks,
        pq_decoded_col,
        pq_topk,
        pq_topk_sql,
    )

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    qvecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter("vec_id in (0, 1, 2)").collect()
    }
    got = [tuple(r) for r in pq_topk(emb, qvecs, 10).collect()]
    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from '{sf_smoke}/embeddings.parquet'"
    )
    want = [tuple(w) for w in con.execute(pq_topk_sql([0, 1, 2], 10)).fetchall()]
    assert sorted(got) == sorted(want)

    # structural: each decoded subvector is exactly one codebook slice
    cb = pq_codebooks(emb, 4, 16)
    m, ks, L = cb.shape
    dec = emb.select("vec_id", pq_decoded_col(cb).alias("d")).limit(20).collect()
    for r in dec:
        v = np.asarray(r["d"])
        for j in range(m):
            sub = v[j * L:(j + 1) * L]
            assert any(np.array_equal(sub, cb[j, ci]) for ci in range(ks)), (
                r["vec_id"], j)

    exact = brute_force_topk(emb, qvecs, 10).collect()
    by_q_exact = {}
    for r in exact:
        by_q_exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    by_q_pq = {}
    for qid, _rank, vid, _s in got:
        by_q_pq.setdefault(qid, set()).add(vid)
    # PQ at m=4/ks=16 over these near-random synthetic embeddings is
    # very lossy (measured recall@10 sums ~12/30 across configs), so
    # assert the robust properties: the query's own vector (cosine 1.0)
    # survives quantization into its top-10, and aggregate overlap with
    # the exact top-10s clears a margin below the measured 12.
    for qid in by_q_exact:
        assert qid in by_q_pq[qid], (qid, by_q_pq[qid])
    total = sum(len(by_q_pq[q] & by_q_exact[q]) for q in by_q_exact)
    assert total >= 8, {q: by_q_pq[q] & by_q_exact[q] for q in by_q_exact}


def test_ivfpq_vs_duckdb_and_candidate_law(spark, sf_smoke):
    """IVF-PQ == its SQL twin exactly; every returned candidate's IVF
    list is one of the query's probed lists (computed on ORIGINAL
    vectors), while its score equals the PQ-decoded cosine."""
    import duckdb

    from smse_backend_spark.operators.ann import (
        ivfpq_topk,
        ivfpq_topk_sql,
        pq_codebooks,
        pq_decoded_col,
    )

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    qvecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter("vec_id in (0, 1, 2)").collect()
    }
    got = [tuple(r) for r in ivfpq_topk(emb, qvecs, 10).collect()]
    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from '{sf_smoke}/embeddings.parquet'"
    )
    want = [tuple(w) for w in con.execute(ivfpq_topk_sql([0, 1, 2], 10)).fetchall()]
    assert sorted(got) == sorted(want) and len(got) == 30

    # score law: each hit's score equals the cosine of the query's
    # ORIGINAL vector against the candidate's PQ-DECODED vector
    cb = pq_codebooks(emb, 4, 16)
    hit_ids = sorted({vid for _q, _r, vid, _s in got})
    dec = {
        r["vec_id"]: np.asarray(r["d"], dtype=np.float64)
        for r in emb.filter(F.col("vec_id").isin(hit_ids))
        .select("vec_id", pq_decoded_col(cb).alias("d")).collect()
    }
    for qid, _rank, vid, score in got[:10]:
        q = np.asarray(qvecs[qid], dtype=np.float64)
        d = dec[vid]
        expect = round(
            float(q @ d / (np.linalg.norm(q) * np.linalg.norm(d))), 6
        )
        assert abs(score - expect) < 2e-6, (qid, vid, score, expect)


def test_bbq_vs_duckdb_and_rescore_semantics(spark, sf_smoke):
    """Binary-quantized (1-bit sign code) ANN == its SQL twin exactly;
    final scores are EXACT cosines (a subset of the brute-force score
    map); oversampled rescore recovers most of the full-precision top-10
    despite the 32x-compressed phase-1 codes."""
    import duckdb

    from smse_backend_spark.operators.ann import (
        bbq_topk,
        bbq_topk_sql,
        brute_force_topk,
    )

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    qvecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter("vec_id in (0, 1, 2)").collect()
    }
    got = [tuple(r) for r in bbq_topk(emb, qvecs, 10, 3.0).collect()]
    con = duckdb.connect()
    con.execute(
        f"create view embeddings as select * from '{sf_smoke}/embeddings.parquet'"
    )
    want = [tuple(w) for w in
            con.execute(bbq_topk_sql([0, 1, 2], 10, 3.0)).fetchall()]
    assert sorted(got) == sorted(want)

    n = emb.count()
    exact = brute_force_topk(emb, qvecs, n).collect()
    score_map = {(r["query_id"], r["vec_id"]): r["score"] for r in exact}
    for qid, _rank, vid, s in got:
        assert score_map[(qid, vid)] == s  # phase 2 is the exact cosine
    top_exact = {}
    for r in exact:
        if r["rank"] <= 10:
            top_exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    by_q = {}
    for qid, _rank, vid, _s in got:
        by_q.setdefault(qid, set()).add(vid)
    wide = [tuple(r) for r in bbq_topk(emb, qvecs, 10, 10.0).collect()]
    by_q_wide = {}
    for qid, _rank, vid, _s in wide:
        by_q_wide.setdefault(qid, set()).add(vid)
    for qid, ex in top_exact.items():
        r3 = len(by_q[qid] & ex)
        r10 = len(by_q_wide[qid] & ex)
        # 1-bit codes are lossy; some recall must survive at 3x and a
        # wider oversample must recover at least as much (the ES BBQ
        # rescore_vector tuning contract)
        assert r3 >= 3, (qid, by_q[qid], ex)
        assert r10 >= r3
        # each query's own vector survives 1-bit quantization at rank 1
    for qid in qvecs:
        first = min((r for r in got if r[0] == qid), key=lambda r: r[1])
        assert first[2] == qid and first[3] == 1.0
