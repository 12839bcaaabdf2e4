"""Deduplication operators for large-scale training-data pipelines.

Exact (hash groupBy), n-gram Jaccard (shingle self-join), MinHash+LSH
(banded signatures), SimHash (hamming banding), and embedding-cosine
near-dup. Everything except SimHash is pure Column algebra with an exactly
matching DuckDB oracle; SimHash uses a numpy kernel (verified against an
in-repo python oracle in tests).

Hash discipline: every hash in these operators derives from
``sha256(value)`` reduced to int — identically computable in Spark
(``conv(substring(sha2(x,256),1,15),16,10)``), DuckDB
(``('0x' || x[1:15])::BIGINT`` over ``sha256``), and numpy/python
(``int(hashlib.sha256(x).hexdigest()[:15], 16)``) — so engine and oracle
agree bit-for-bit. No engine-private hash (xxhash64/murmur) crosses an
oracle boundary.

Scale notes: the shingle self-join explodes *distinct* shingles only and
aggregates pair-counts map-side; MinHash/LSH replaces the quadratic join
with band-bucket equijoins (the standard 10^12-row path); candidate pair
verification stays on the candidates, never the full cross product.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from smse_backend_spark.functions.tokenizer import tokenize_col, tokenize_duckdb_sql

# (a, b) parameters of the affine MinHash family over the Mersenne prime
# 2^31-1; generated once, deterministic, shared by engine and oracle.
MINHASH_P = 2_147_483_647


def _minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    import hashlib

    out = []
    for i in range(num_hashes):
        a = int(hashlib.sha256(f"mh_a_{i}".encode()).hexdigest()[:12], 16) % (MINHASH_P - 1) + 1
        b = int(hashlib.sha256(f"mh_b_{i}".encode()).hexdigest()[:12], 16) % MINHASH_P
        out.append((a, b))
    return out


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dup_groups(docs: DataFrame, min_count: int = 2) -> DataFrame:
    """Groups of byte-identical documents: (content_sha256, n_dups, canonical
    = min doc_id). The sha256 column doubles as the reference-corpus
    invariant."""
    return (
        docs.groupBy(F.sha2(F.col("text"), 256).alias("content_sha256"))
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("n_dups") >= min_count)
    )


def exact_dup_groups_sql(min_count: int = 2) -> str:
    return f"""
SELECT sha256(text) AS content_sha256, count(*) AS n_dups,
       min(doc_id) AS canonical_doc_id
FROM documents GROUP BY 1 HAVING count(*) >= {min_count}
"""


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Survivor view: keep the min doc_id per identical-content group.

    The hash is projected BEFORE the window shuffle and ``text`` is dropped,
    so the exchange carries ~100 B/row (hash + keys), not the documents
    themselves — at 100 TB that is the difference between shuffling ~100 GB
    and shuffling the corpus.
    """
    hashed = docs.select(
        "doc_id", "lang", "source", F.sha2(F.col("text"), 256).alias("h")
    )
    w = Window.partitionBy("h")
    return (
        hashed.withColumn("canonical", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("canonical"))
        .select("doc_id", "lang", "source")
    )


def dedup_exact_sql() -> str:
    return """
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         min(doc_id) OVER (PARTITION BY sha256(text)) AS canonical
  FROM documents
) WHERE doc_id = canonical
"""


# ---------------------------------------------------------------------------
# word n-gram shingles + Jaccard
# ---------------------------------------------------------------------------

def shingles_col(text_col, n: int = 3):
    """Distinct word n-gram shingles as array<string> (empty if < n tokens)."""
    toks = tokenize_col(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _shingles_duckdb(n: int = 3) -> str:
    """DuckDB expression over alias ``t`` (a token list column)."""
    parts = " || ' ' || ".join(f"t[i+{j}]" for j in range(n))
    return (
        f"CASE WHEN len(t) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len(t) - {n - 2}), i -> {parts})) "
        "ELSE [] END"
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by n-gram Jaccard >= threshold (doc_a < doc_b).

    Candidate generation is an equi-join on shared shingles (never a cross
    product); intersection counts aggregate map-side.

    ``max_df`` is the hot-shingle cut that makes the plan survive 10^12
    rows: a boilerplate shingle shared by 10^6 docs alone creates 10^12
    candidate rows, so shingles with document frequency > max_df are
    dropped from BOTH the candidate join and the per-doc set sizes —
    Jaccard is then computed consistently over the filtered shingle sets
    (stopword-filtered Jaccard). The oracle applies the identical cut.
    """
    # spread the tokenize+shingle Column work across the executor width:
    # a single-file corpus arrives as one input split and would serialize
    # this stage on one core (see minhash_lsh_pairs). Result-invariant.
    par = docs.sparkSession.sparkContext.defaultParallelism
    sh = docs.repartition(par, "doc_id").select(
        "doc_id", F.explode(shingles_col(F.col("text"), n)).alias("shingle")
    )
    if max_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("sz_b"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def ngram_jaccard_pairs_sql(
    n: int = 3, threshold: float = 0.8, max_df: int | None = None
) -> str:
    toks = tokenize_duckdb_sql("text")
    df_cut = (
        f"sh AS (SELECT doc_id, shingle FROM sh0 WHERE shingle IN "
        f"(SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= {max_df})),"
        if max_df is not None
        else "sh AS (SELECT * FROM sh0),"
    )
    return f"""
WITH tok AS (SELECT doc_id, {toks} AS t FROM documents),
sh0 AS (
  SELECT doc_id, unnest({_shingles_duckdb(n)}) AS shingle FROM tok
),
{df_cut}
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(inter / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(inter / (sa.n_sh + sb.n_sh - inter), 6) >= {threshold}
"""


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _sha_int_col(c):
    return F.conv(F.substring(F.sha2(c, 256), 1, 15), 16, 10).cast("long")


def minhash_signature_col(text_col, num_hashes: int = 16, n: int = 3):
    """array<long> MinHash signature over n-gram shingles (empty-set docs
    get p as the identity minimum — matches the oracle)."""
    hv = F.transform(shingles_col(text_col, n), lambda s: _sha_int_col(s) % MINHASH_P)
    sig = []
    for a, b in _minhash_params(num_hashes):
        sig.append(
            F.coalesce(
                F.array_min(
                    F.transform(hv, lambda v: (F.lit(a) * v + F.lit(b)) % F.lit(MINHASH_P))
                ),
                F.lit(MINHASH_P),
            )
        )
    return F.array(*sig)


def minhash_lsh_pairs(
    docs: DataFrame, num_hashes: int = 16, bands: int = 4, n: int = 3
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH (doc_a < doc_b,
    deduped across bands). Quadratic-free: one explode to (band, band_sig)
    keys, self-equijoin on the bucket."""
    r = num_hashes // bands
    # the signature Column (shingle explode + num_hashes min-folds of
    # sha-derived values) is the CPU-heavy stage; a single-file corpus
    # under maxPartitionBytes arrives as ONE input split, which serializes
    # it on one core (measured 13 min for 100k docs at sf0.1) — spread it
    # across the executor width first. Result-invariant: the output is a
    # distinct pair set.
    par = docs.sparkSession.sparkContext.defaultParallelism
    sig = docs.repartition(par, "doc_id").select(
        "doc_id", minhash_signature_col(F.col("text"), num_hashes, n).alias("sig")
    )
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.concat_ws("_", *[F.element_at("sig", i * r + j + 1).cast("string")
                                       for j in range(r)]).alias("key"),
                )
                for i in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs_sql(num_hashes: int = 16, bands: int = 4, n: int = 3) -> str:
    r = num_hashes // bands
    toks = tokenize_duckdb_sql("text")
    params = _minhash_params(num_hashes)
    sig_elems = ", ".join(
        f"coalesce(list_min(list_transform(hv, v -> ({a} * v + {b}) % {MINHASH_P})), {MINHASH_P})"
        for a, b in params
    )
    band_rows = ", ".join(
        "(" + str(i) + ", " + " || '_' || ".join(
            f"sig[{i * r + j + 1}]::VARCHAR" for j in range(r)
        ) + ")"
        for i in range(bands)
    )
    return f"""
WITH tok AS (SELECT doc_id, {toks} AS t FROM documents),
shg AS (SELECT doc_id, {_shingles_duckdb(n)} AS sh FROM tok),
hv AS (
  SELECT doc_id,
         list_transform(sh, s -> ('0x' || substring(sha256(s), 1, 15))::BIGINT % {MINHASH_P}) AS hv
  FROM shg
),
sig AS (SELECT doc_id, [{sig_elems}] AS sig FROM hv),
banded AS (
  SELECT doc_id, b.* FROM sig, (VALUES {band_rows}) b(band, key)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
"""


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup(emb: DataFrame, threshold: float = 0.3) -> DataFrame:
    """All pairs with cosine >= threshold (vec_a < vec_b) — exact baseline.

    Brute force is the *correctness* path (mirrors the reference's exact
    pgvector scan); the LSH-bucketed ANN in ``operators/ann.py`` is the
    scale path.
    """
    from smse_backend_spark.functions.vectors import cosine_col

    # the nested-loop pair join parallelizes over the STREAMED side's
    # partitions; a single-file input would run it on one core
    par = emb.sparkSession.sparkContext.defaultParallelism
    a = emb.repartition(par, "vec_id").select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(cosine_col(F.col("ea"), F.col("eb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def embedding_near_dup_lsh(
    emb: DataFrame, threshold: float = 0.3,
    n_planes: int = 8, n_tables: int = 4,
) -> DataFrame:
    """Scale path for embedding near-dup: candidates = pairs sharing a
    sign-random-projection bucket in ANY of ``n_tables`` tables, exact
    cosine only on candidates — a banded equijoin like MinHash LSH, never
    the O(n^2) cross product of :func:`embedding_near_dup`.

    Deterministic sha-derived planes (``operators/ann.rademacher_planes``)
    make the candidate set — and hence the result — exactly replayable by
    the DuckDB oracle. Recall is probabilistic in ``threshold`` (standard
    LSH); the exact baseline stays beside it as the recall anchor.
    """
    from smse_backend_spark.functions.vectors import cosine_col
    from smse_backend_spark.operators.ann import lsh_buckets_col, rademacher_planes
    from smse_backend_spark.session import ensure_pyfiles

    ensure_pyfiles(emb.sparkSession)
    dim = len(emb.select("embedding").first()[0])
    planes = rademacher_planes(dim, n_planes, n_tables)
    buckets = emb.select(
        "vec_id",
        F.posexplode(lsh_buckets_col(planes)(F.col("embedding"))).alias("t", "bucket"),
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    pairs = (
        a.join(b, (F.col("a.t") == F.col("b.t"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    return (
        pairs.join(ea, "vec_a").join(eb, "vec_b")
        .withColumn("cosine", F.round(cosine_col(F.col("ea"), F.col("eb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


def semdedup(
    emb: DataFrame,
    n_centroids: int = 16,
    train_iters: int = 1,
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication via k-means clustering + within-cluster cosine. The
    paper's recipe verbatim — (1) cluster the embeddings (here: the
    repo's DETERMINISTIC IVF training,
    ``operators/ann.train_ivf_centroids`` — seed rows + integer-quantized
    Lloyd means, exactly replayable in SQL); (2) within each cluster,
    pairs with cosine >= ``threshold`` are semantic duplicates; (3) from
    each duplicate pair, KEEP the member with the LOWER similarity to
    its cluster centroid (the paper keeps low-centroid-similarity
    examples — they are the more "outlying", informative ones) and drop
    the other; ties break on vec_id. Returns the DROP list
    ``(vec_id, c_id, centroid_sim)``.

    Scale shape: clustering bounds the quadratic blow-up — the pair join
    is keyed on ``c_id`` so only same-cluster pairs materialize (the
    SemDeDup design point; at 10^12 rows the per-cluster cap is enforced
    by raising ``n_centroids``, exactly as the paper scales K with N).
    Assignment is one Arrow-batched matmul pass; centroids broadcast.
    """
    from smse_backend_spark.functions.vectors import cosine_col
    from smse_backend_spark.operators.ann import train_ivf_centroids
    from smse_backend_spark.session import ensure_pyfiles

    ensure_pyfiles(emb.sparkSession)
    c_ids, c_mat = train_ivf_centroids(emb, n_centroids, train_iters)
    cn = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)

    @F.pandas_udf("array<double>")
    def assign(col: pd.Series) -> pd.Series:
        m = np.vstack(col.to_numpy()).astype(np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = np.round(mn @ cn.T, 6)
        j = np.argmax(sims, axis=1)  # first max -> smallest c_id (sorted)
        pick = sims[np.arange(len(j)), j]
        return pd.Series(
            [[float(c), float(s)] for c, s in zip(c_ids[j], pick)]
        )

    csim = emb.select(
        "vec_id", "embedding", assign("embedding").alias("a")
    ).select(
        "vec_id", "embedding",
        F.element_at("a", 1).cast("long").alias("c_id"),
        F.element_at("a", 2).alias("sim"),
    )
    a = csim.select(
        F.col("vec_id").alias("va"), F.col("c_id"),
        F.col("sim").alias("sa"), F.col("embedding").alias("ea"),
    )
    b = csim.select(
        F.col("vec_id").alias("vb"), F.col("c_id"),
        F.col("sim").alias("sb"), F.col("embedding").alias("eb"),
    )
    dropped = (
        a.join(b, "c_id")
        .filter(F.col("va") < F.col("vb"))
        .withColumn("cosine", F.round(cosine_col(F.col("ea"), F.col("eb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.when(
                (F.col("sa") < F.col("sb"))
                | ((F.col("sa") == F.col("sb")) & (F.col("va") < F.col("vb"))),
                F.col("vb"),
            ).otherwise(F.col("va")).alias("vec_id")
        )
        .distinct()
    )
    return (
        dropped.join(csim.select("vec_id", "c_id", "sim"), "vec_id")
        .select("vec_id", "c_id", F.col("sim").alias("centroid_sim"))
        .orderBy("vec_id")
    )


def semdedup_sql(
    dim: int = 64,
    n_centroids: int = 16,
    threshold: float = 0.95,
) -> str:
    """DuckDB twin of :func:`semdedup` (train_iters=1): the shared
    trained-assignment CTE prefix (one replayed Lloyd round), per-vector
    centroid similarity from the assignment, within-cluster pairwise
    cosine, the keep-low-centroid-sim drop rule."""
    from smse_backend_spark.operators.ann import trained_assignment_ctes

    return f"""
WITH {trained_assignment_ctes(dim, n_centroids)},
csim AS (
  SELECT ps.vec_id, ps.c_id, ps.sim
  FROM ps JOIN assigned a ON ps.vec_id = a.vec_id AND ps.c_id = a.c_id
),
cand AS (
  SELECT a.vec_id AS va, b.vec_id AS vb, a.c_id,
         a.sim AS sa, b.sim AS sb
  FROM csim a JOIN csim b ON a.c_id = b.c_id AND a.vec_id < b.vec_id
),
z2 AS (
  SELECT c.va, c.vb, c.sa, c.sb,
         unnest(ea.embedding)::DOUBLE AS x, unnest(eb.embedding)::DOUBLE AS y
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.va
  JOIN embeddings eb ON eb.vec_id = c.vb
),
ps2 AS (
  SELECT va, vb, any_value(sa) AS sa, any_value(sb) AS sb,
         round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) AS cosine
  FROM z2 GROUP BY va, vb
),
dropped AS (
  SELECT DISTINCT
         CASE WHEN sa < sb OR (sa = sb AND va < vb) THEN vb ELSE va END AS vec_id
  FROM ps2 WHERE cosine >= {threshold!r}
)
SELECT d.vec_id AS vec_id, c.c_id AS c_id, c.sim AS centroid_sim
FROM dropped d JOIN csim c ON c.vec_id = d.vec_id
ORDER BY vec_id
"""


def embedding_near_dup_lsh_sql(
    threshold: float = 0.3, dim: int = 64,
    n_planes: int = 8, n_tables: int = 4,
) -> str:
    from smse_backend_spark.operators.ann import lsh_buckets_sql, rademacher_planes

    planes = rademacher_planes(dim, n_planes, n_tables)
    return f"""
WITH {lsh_buckets_sql(planes).lstrip()},
pairs AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckets a JOIN buckets b
    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
z AS (
  SELECT p.vec_a, p.vec_b,
         unnest(ea.embedding)::DOUBLE AS x, unnest(eb.embedding)::DOUBLE AS y
  FROM pairs p
  JOIN embeddings ea ON ea.vec_id = p.vec_a
  JOIN embeddings eb ON eb.vec_id = p.vec_b
),
s AS (
  SELECT vec_a, vec_b,
         round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) AS cosine
  FROM z GROUP BY vec_a, vec_b
)
SELECT vec_a, vec_b, cosine FROM s WHERE cosine >= {threshold}
"""


def embedding_near_dup_sql(threshold: float = 0.3) -> str:
    return f"""
WITH z AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         unnest(a.embedding)::DOUBLE AS x, unnest(b.embedding)::DOUBLE AS y
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
),
s AS (
  SELECT vec_a, vec_b,
         round(sum(x*y) / (sqrt(sum(x*x)) * sqrt(sum(y*y))), 6) AS cosine
  FROM z GROUP BY vec_a, vec_b
)
SELECT vec_a, vec_b, cosine FROM s WHERE cosine >= {threshold}
"""


# ---------------------------------------------------------------------------
# duplicate clustering: pairs -> connected components -> canonical doc
# ---------------------------------------------------------------------------

def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """Connected components over undirected dup pairs by min-label
    propagation (the Pregel-style CC): every vertex starts labeled with
    itself; each round takes the min of its own and its neighbors'
    labels; fixpoint = each vertex labeled with its component's smallest
    doc_id. Deterministic.

    Scale shape: one equijoin + one groupBy-min per round, converging in
    O(component diameter) rounds — near-dup graphs from banded LSH are
    clique-ish, so 2-4 rounds in practice. Each round's labels are
    ``localCheckpoint``-ed to truncate the iterative lineage (swap for
    ``checkpoint`` on a cluster with an HDFS/S3 checkpoint dir); the
    fixpoint test is a driver count of changed labels.

    Returns (doc_id, cluster_id) for every vertex that appears in a pair.
    """
    e = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        prop = edges.join(
            labels.select(F.col("doc_id").alias("dst"), "cluster_id"), "dst"
        ).select(F.col("src").alias("doc_id"), "cluster_id")
        new = (
            labels.unionByName(prop)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint()
        )
        changed = (
            new.join(
                labels.withColumnRenamed("cluster_id", "old"), "doc_id"
            )
            .filter(F.col("cluster_id") != F.col("old"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


def dup_clusters(
    docs: DataFrame, num_hashes: int = 16, bands: int = 4, n: int = 3
) -> DataFrame:
    """Canonical-doc assignment: MinHash-LSH candidate pairs -> connected
    components -> every doc labeled with its cluster's smallest doc_id
    (singletons label themselves). The end state of the dedup pipeline:
    ``filter(doc_id == cluster_id)`` is the survivor view, and
    ``cluster_id`` is the provenance key for dropped near-dups."""
    comp = connected_components(minhash_lsh_pairs(docs, num_hashes, bands, n))
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    )


def dup_clusters_sql(num_hashes: int = 16, bands: int = 4, n: int = 3) -> str:
    """DuckDB twin: exact components via a recursive reachability CTE over
    the same pair SQL (tractable at oracle scale; the Spark side is the
    distributed algorithm)."""
    pairs = minhash_lsh_pairs_sql(num_hashes, bands, n)
    return f"""
WITH RECURSIVE pr AS (SELECT * FROM ({pairs})),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pr
  UNION
  SELECT doc_b, doc_a FROM pr
),
reach(v, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM reach JOIN edges e ON e.dst = reach.v
),
comp AS (SELECT v, min(r) AS cluster_id FROM reach GROUP BY v)
SELECT d.doc_id AS doc_id,
       COALESCE(c.cluster_id, d.doc_id)::BIGINT AS cluster_id
FROM documents d LEFT JOIN comp c ON c.v = d.doc_id
"""


def substring_dup_pairs(
    docs: DataFrame,
    n: int = 8,
    min_shared: int = 2,
    k: int = 20,
    max_df: int | None = None,
) -> DataFrame:
    """Exact-substring deduplication (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): doc pairs sharing at
    least ``min_shared`` DISTINCT n-token windows, with the count of
    shared windows — the signal that one document verbatim-copies a
    passage of another even when the docs as wholes are dissimilar
    (which is why Jaccard/MinHash miss it). The single-node reference
    algorithm is a corpus-wide suffix array; the Spark re-expression is
    a window equi-join — every length-``n`` token window (distinct per
    doc), joined on window equality, pair counts aggregated map-side.

    Returns (doc_a, doc_b, n_shared) with doc_a < doc_b, ordered
    (n_shared desc, doc_a asc, doc_b asc), top ``k``.

    Scale shape: candidate generation is the shingle equi-join (never a
    cross product); ``max_df`` is the hot-window cut (identical to
    :func:`ngram_jaccard_pairs`'s hot-shingle cut) that bounds the
    per-window fan-out at 10^12 docs — at n=8 a window shared by many
    docs IS boilerplate (license headers, generated code), exactly what
    exact-substring dedup wants to skip or handle via the cut. At scale
    the join key becomes a 64-bit window hash verified in-bucket
    (``dedup.py`` hash discipline); at oracle scale the window text
    itself is the key, which is collision-free by construction.
    """
    # spread the shingle stage (single-input-split serialization — see
    # minhash_lsh_pairs); result-invariant
    par = docs.sparkSession.sparkContext.defaultParallelism
    w = docs.repartition(par, "doc_id").select(
        "doc_id", F.explode(shingles_col(F.col("text"), n)).alias("win")
    )
    if max_df is not None:
        keep = (
            w.groupBy("win")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("win")
        )
        w = w.join(keep, "win", "left_semi")
    a, b = w.alias("a"), w.alias("b")
    return (
        a.join(b, (F.col("a.win") == F.col("b.win"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
        .orderBy(F.desc("n_shared"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(int(k))
    )


def dup_ngram_fraction(
    docs: DataFrame,
    n: int = 8,
    min_frac: float = 0.3,
    k: int = 100,
) -> DataFrame:
    """WIMBD-style duplicate n-gram rate (Elazar et al. 2024, "What's In
    My Big Data?"): for each document, the fraction of its DISTINCT
    n-token windows that occur in at least one OTHER document — the
    per-doc boilerplate/contamination signal (license headers, generated
    code, copied passages) that complements the pairwise view of
    :func:`substring_dup_pairs`. Returns (doc_id, n_windows, dup_windows,
    dup_frac) for docs with ``dup_frac >= min_frac``, ordered (dup_frac
    desc, doc_id asc), top ``k``; ``dup_frac`` is 6dp-rounded from an
    exact integer ratio so both engines round the same double.

    Scale shape: ONE distinct-window explode (in-row dedup first), the
    window-df agg is map-side combined and vocabulary-bounded, the
    per-doc roll-up re-uses the exploded frame — no pair join at all,
    which is why WIMBD can report this at corpus scale."""
    # spread the shingle stage (single-input-split serialization — see
    # minhash_lsh_pairs); result-invariant
    par = docs.sparkSession.sparkContext.defaultParallelism
    w = docs.repartition(par, "doc_id").select(
        "doc_id", F.explode(shingles_col(F.col("text"), n)).alias("win")
    )
    dfw = w.groupBy("win").agg(F.count(F.lit(1)).alias("wdf"))
    per_doc = (
        w.join(dfw, "win")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum(F.when(F.col("wdf") >= 2, 1).otherwise(0))
            .cast("long").alias("dup_windows"),
        )
    )
    return (
        per_doc.withColumn(
            "dup_frac",
            F.round(
                F.col("dup_windows").cast("double")
                / F.col("n_windows").cast("double"),
                6,
            ),
        )
        .filter(F.col("dup_frac") >= float(min_frac))
        .orderBy(F.desc("dup_frac"), F.asc("doc_id"))
        .limit(int(k))
    )


def dup_ngram_fraction_sql(
    n: int = 8,
    min_frac: float = 0.3,
    k: int = 100,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`dup_ngram_fraction`."""
    sh = _shingles_duckdb(n)
    return f"""
WITH toks AS (
  SELECT doc_id, {tokenize_duckdb_sql("text")} AS t FROM {table}
),
w AS (
  SELECT doc_id, unnest({sh}) AS win FROM toks
),
dfw AS (
  SELECT win, count(*)::BIGINT AS wdf FROM w GROUP BY win
),
per_doc AS (
  SELECT w.doc_id AS doc_id,
         count(*)::BIGINT AS n_windows,
         sum(CASE WHEN dfw.wdf >= 2 THEN 1 ELSE 0 END)::BIGINT AS dup_windows
  FROM w JOIN dfw USING (win)
  GROUP BY w.doc_id
)
SELECT doc_id, n_windows, dup_windows,
       round(dup_windows::DOUBLE / n_windows::DOUBLE, 6) AS dup_frac
FROM per_doc
WHERE round(dup_windows::DOUBLE / n_windows::DOUBLE, 6) >= {float(min_frac)!r}
ORDER BY dup_frac DESC, doc_id ASC
LIMIT {int(k)}
"""


def substring_dup_pairs_sql(
    n: int = 8,
    min_shared: int = 2,
    k: int = 20,
    max_df: int | None = None,
) -> str:
    """DuckDB twin of :func:`substring_dup_pairs`."""
    toks = tokenize_duckdb_sql("text")
    df_cut = (
        f"w AS (SELECT doc_id, win FROM w0 WHERE win IN "
        f"(SELECT win FROM w0 GROUP BY win HAVING count(*) <= {max_df})),"
        if max_df is not None
        else "w AS (SELECT * FROM w0),"
    )
    return f"""
WITH tok AS (SELECT doc_id, {toks} AS t FROM documents),
w0 AS (
  SELECT doc_id, unnest({_shingles_duckdb(n)}) AS win FROM tok
),
{df_cut}
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
  FROM w a JOIN w b ON a.win = b.win AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared
FROM pairs
WHERE n_shared >= {int(min_shared)}
ORDER BY n_shared DESC, doc_a ASC, doc_b ASC
LIMIT {int(k)}
"""


# ---------------------------------------------------------------------------
# Bloom-filter dedup (the Dolma / trillion-token streaming discipline)
# ---------------------------------------------------------------------------

BLOOM_SALT = "-bloom-h"


def bloom_dedup_flags(
    docs: DataFrame, m_bits: int = 4096, k_hashes: int = 4
) -> DataFrame:
    """Bloom-filter exact-dedup replayed deterministically in batch —
    the fixed-memory discipline Dolma uses to dedup trillions of tokens
    (a Bloom filter over content, docs whose bits are all already set
    are dropped), with the filter's false-positive semantics made
    first-class instead of hidden.

    Stream order is ``doc_id`` ascending. Doc ``d``'s ``k_hashes`` bits
    are ``sha256(text || salt_i) % m_bits``; ``d`` is FLAGGED iff every
    one of its bits was already set by some earlier doc (``min`` setter
    ``< d`` per bit). A later byte-identical copy is always flagged
    (same bits, earlier setter); a flagged doc with no earlier identical
    text is a false positive, whose rate is the textbook
    ``(1 - exp(-k*n/m))^k``. Returns (doc_id, is_exact_dup) for flagged
    docs, ``is_exact_dup`` distinguishing true duplicates from FPs —
    ordered by doc_id.

    Scale shape: the bits frame is ``k_hashes`` rows/doc; the filter
    state is the per-bit ``min(doc_id)`` — a map-side-combined groupBy
    onto at most ``m_bits`` keys (fixed-size, associatively mergeable,
    exactly the Bloom array with "first setter" in place of "set"). The
    verdict join keys on bit id (bounded keyspace — broadcast the state
    when ``m_bits`` is small; at 10^12 docs shard the filter by bit
    range, the standard partitioned-Bloom layout). ``is_exact_dup`` is
    one window min over the content hash — the exact-dedup shuffle unit
    (~100 B/row: hashes move, text never does).
    """
    from smse_backend_spark.operators.sampling import hash_u60

    bits = docs.select(
        "doc_id",
        F.explode(
            F.array(*[
                (hash_u60(F.col("text"), f"{BLOOM_SALT}{i}") % int(m_bits))
                .cast("long")
                for i in range(k_hashes)
            ])
        ).alias("bit"),
    )
    state = bits.groupBy("bit").agg(F.min("doc_id").alias("first_doc"))
    flagged = (
        bits.join(state, "bit")
        .groupBy("doc_id")
        .agg(
            F.max(
                F.when(F.col("first_doc") >= F.col("doc_id"), 1).otherwise(0)
            ).alias("any_first"),
        )
        .filter(F.col("any_first") == 0)
        .select("doc_id")
    )
    first_text = docs.select(
        "doc_id",
        (
            F.min("doc_id").over(
                Window.partitionBy(F.sha2(F.col("text"), 256))
            ) < F.col("doc_id")
        ).alias("is_exact_dup"),
    )
    return (
        flagged.join(first_text, "doc_id")
        .select("doc_id", "is_exact_dup")
        .orderBy("doc_id")
    )


def bloom_dedup_flags_sql(
    m_bits: int = 4096, k_hashes: int = 4, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`bloom_dedup_flags` — same bit hashes, same
    first-setter rule, same exact-dup witness."""
    from smse_backend_spark.operators.sampling import _hash_u60_sql

    bit_rows = " UNION ALL ".join(
        f"SELECT doc_id, ({_hash_u60_sql('text', f'{BLOOM_SALT}{i}')}"
        f" % {int(m_bits)}) AS bit FROM {table}"
        for i in range(k_hashes)
    )
    return f"""
WITH bits AS (
  SELECT doc_id, bit FROM ({bit_rows})
),
state AS (
  SELECT bit, min(doc_id) AS first_doc FROM bits GROUP BY bit
),
flagged AS (
  SELECT doc_id
  FROM bits JOIN state USING (bit)
  GROUP BY doc_id
  HAVING max(CASE WHEN first_doc >= doc_id THEN 1 ELSE 0 END) = 0
),
ft AS (
  SELECT doc_id,
         min(doc_id) OVER (PARTITION BY sha256(text)) < doc_id
         AS is_exact_dup
  FROM {table}
)
SELECT doc_id, is_exact_dup
FROM flagged JOIN ft USING (doc_id)
ORDER BY doc_id
"""
