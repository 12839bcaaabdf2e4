"""Round-2 operator tests: simhash recall at the contracted radius,
thumbnail fit geometry, scale-safe dedup shuffle, prefs merge/clear,
LSH near-dup consistency."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from smse_backend_spark.operators.simhash import band_plan, simhash_py

# Planted near-dup pair: hamming(sig_a, sig_b) == 9, and the differing bits
# touch ALL FOUR 16-bit bands of the old fixed 4-band scheme (so banding
# with n_bands=4 provably misses it), while the contract radius
# max_hamming=10 -> 11 bands guarantees a shared band by pigeonhole.
PLANT_A = "spark index query merge join scan filter shuffle broadcast partition"
PLANT_B = PLANT_A + " hash"


def test_band_plan_covers_64_bits():
    for n in (1, 4, 11, 13, 64):
        plan = band_plan(n)
        assert len(plan) == n
        assert sum(b for _, b in plan) == 64
        # contiguous, non-overlapping
        shift = 0
        for s, b in plan:
            assert s == shift and b >= 1
            shift += b
        # sizes differ by at most one
        sizes = {b for _, b in plan}
        assert max(sizes) - min(sizes) <= 1


def test_planted_pair_properties():
    sa, sb = simhash_py(PLANT_A), simhash_py(PLANT_B)
    h = bin(sa ^ sb).count("1")
    assert 4 <= h <= 10, h
    old_bands = [((sa >> (i * 16)) & 0xFFFF, (sb >> (i * 16)) & 0xFFFF) for i in range(4)]
    assert all(x != y for x, y in old_bands), "pair must defeat the old 4-band scheme"


def test_simhash_neardup_finds_planted_pair(spark):
    from smse_backend_spark.operators.simhash import simhash_neardup_pairs

    docs = spark.createDataFrame(
        [(1, PLANT_A), (2, PLANT_B), (3, "completely different words entirely unrelated")],
        "doc_id long, text string",
    )
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_neardup_pairs(docs, max_hamming=10).collect()
    }
    assert (1, 2) in pairs
    assert pairs[(1, 2)] == bin(simhash_py(PLANT_A) ^ simhash_py(PLANT_B)).count("1")


def test_fit_crop_box_matches_pil_arithmetic():
    from smse_backend_spark.sources.multimodal import fit_crop_box

    # landscape wider than 16:9 -> full height, width cropped centered
    box = fit_crop_box(1000, 180, 320, 180)
    assert box == ((1000 - 320 / 180 * 180) / 2, 0.0,
                   (1000 - 320 / 180 * 180) / 2 + 320 / 180 * 180, 180.0)
    # portrait -> full width, height cropped centered
    l, t, r, b = fit_crop_box(320, 1000, 320, 180)
    assert (l, r) == (0.0, 320.0)
    crop_h = 320 / (320 / 180)
    assert t == (1000 - crop_h) * 0.5 and b == t + crop_h
    # exact ratio -> identity box
    assert fit_crop_box(640, 360, 320, 180) == (0.0, 0.0, 640.0, 360.0)


def test_fit_resize_nearest_geometry():
    from smse_backend_spark.sources.multimodal import fit_resize_nearest

    img = np.arange(64, dtype=np.float64).reshape(8, 8)
    out = fit_resize_nearest(img, 320, 180)
    assert out.shape == (180, 320)
    # deterministic + every sampled value comes from the source
    assert np.array_equal(out, fit_resize_nearest(img, 320, 180))
    assert set(np.unique(out)) <= set(img.ravel())


def test_dedup_exact_shuffles_hash_not_text(spark, sf_smoke):
    """The window exchange must carry the 64-byte hash, not the document."""
    from smse_backend_spark.operators.dedup import dedup_exact

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    plan = dedup_exact(docs)._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    ex = next(i for i, l in enumerate(lines) if "Exchange" in l)
    # the Project feeding the exchange (printed directly under it in the
    # tree) defines the shuffled row: hash + keys only, never the document
    feeding = next(l for l in lines[ex + 1:] if "Project" in l)
    # text may appear only INSIDE the map-side sha2(...) AS h expression,
    # never as a pass-through column of the shuffled row
    import re

    passthrough = re.sub(r"sha2\(.*?\) AS h#\d+", "", feeding)
    assert "AS h#" in feeding and "text#" not in passthrough, feeding


def test_user_prefs_merge_clear_semantics(spark):
    """A clear event drops everything before it; later merges win per key."""
    import duckdb

    from smse_backend_spark.operators.relational import (
        user_prefs_merge,
        user_prefs_merge_sql,
    )

    rows = [
        # user 1: set a=1, b=2; clear; set a=3 -> {a: 3}
        (1, "2024-01-01 00:00:00", 1, "click", '{"k": 1}'),
        (2, "2024-01-01 00:01:00", 1, "view", '{"k": 2}'),
        (3, "2024-01-01 00:02:00", 1, "signup", "{}"),
        (4, "2024-01-01 00:03:00", 1, "click", '{"k": 3}'),
        # user 2: no clear; click twice -> latest wins -> {click: 9, view: 5}
        (5, "2024-01-01 00:00:00", 2, "click", '{"k": 8}'),
        (6, "2024-01-01 00:01:00", 2, "view", '{"k": 5}'),
        (7, "2024-01-01 00:02:00", 2, "click", '{"k": 9}'),
        # user 3: clear is the last event -> no prefs
        (8, "2024-01-01 00:00:00", 3, "click", '{"k": 4}'),
        (9, "2024-01-01 00:01:00", 3, "signup", "{}"),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "props"])
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        pdf.to_parquet(f"{d}/events.parquet")
        got = {
            (r.user_id, r.pref_key): r.pref_value
            for r in user_prefs_merge(spark, d).collect()
        }
        assert got == {(1, "click"): 3, (2, "click"): 9, (2, "view"): 5}
        con = duckdb.connect()
        con.execute(f"create view events as select * from '{d}/events.parquet'")
        oracle = {
            (u, k): v for u, k, v in con.execute(user_prefs_merge_sql()).fetchall()
        }
        assert got == oracle


def test_embedding_near_dup_lsh_subset_of_exact(spark, sf_smoke):
    """LSH pairs are a subset of the exact pairs with identical cosines."""
    from smse_backend_spark.operators.dedup import (
        embedding_near_dup,
        embedding_near_dup_lsh,
    )

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    exact = {(r.vec_a, r.vec_b): r.cosine for r in embedding_near_dup(emb, 0.3).collect()}
    lsh = {(r.vec_a, r.vec_b): r.cosine for r in embedding_near_dup_lsh(emb, 0.3).collect()}
    assert set(lsh) <= set(exact)
    assert all(exact[p] == c for p, c in lsh.items())
    assert len(lsh) > 0


def test_ann_ivf_recall_and_single_scan(spark, sf_smoke):
    """IVF probes n_probe/n_centroids of the corpus yet keeps useful
    recall@10 vs brute force; the candidate pass is ONE corpus scan."""
    from smse_backend_spark.operators.ann import brute_force_topk, ivf_topk

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    q = {r.vec_id: list(map(float, r.embedding))
         for r in emb.filter(F.col("vec_id") < 3).collect()}
    exact = brute_force_topk(emb, q, 10).collect()
    approx = ivf_topk(emb, q, 10, n_centroids=16, n_probe=4)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    got = approx.collect()
    for qid in q:
        e = {r.vec_id for r in exact if r.query_id == qid}
        a = {r.vec_id for r in got if r.query_id == qid}
        assert len(a & e) / len(e) >= 0.3, (qid, a, e)
    # every IVF hit carries its exact cosine (scores subset of brute force)
    escore = {(r.query_id, r.vec_id): r.score for r in exact}
    for r in got:
        if (r.query_id, r.vec_id) in escore:
            assert r.score == escore[(r.query_id, r.vec_id)]


def test_ann_lsh_single_scan_plan(spark, sf_smoke):
    """The LSH top-k plan reads the corpus ONCE (no per-table scan loop)."""
    from smse_backend_spark.operators.ann import lsh_topk

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    q = {r.vec_id: list(map(float, r.embedding))
         for r in emb.filter(F.col("vec_id") < 2).collect()}
    plan = lsh_topk(emb, q, 5)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
