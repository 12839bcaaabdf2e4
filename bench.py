#!/usr/bin/env python
"""Headline benchmark: index build + BM25 query batch, with scaling evidence.

Prints ONE JSON line:
  {"metric": "bm25_index_plus_query_sec", "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "index": {"n_docs":..., "files_per_sec":..., "bytes":...},
   "query": {"qps":...},
   "scaling": {"cores_lo":8, "cores_hi":32, "t_lo":..., "t_hi":...,
               "files_per_sec_lo":..., "files_per_sec_hi":...,
               "qps_lo":..., "qps_hi":..., "efficiency":...}}

Env:
  SPARK_GRAFT_SF_DIR   corpus dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     high parallelism level (default 32)
  SMSE_BENCH_REPLICAS  deterministic corpus scale-up factor (default 60)
  SMSE_BENCH_SCALING   "0" to skip the low-parallelism subprocess probe

The scaling section evidences the N -> 4N throughput-scaling criterion in
this single-host sandbox: the same job at local[8] vs local[32] on the same
input (each probe in a fresh JVM/subprocess so neither run inherits warm
state). efficiency = t_lo / (t_hi * (cores_hi / cores_lo)).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICAS = int(os.environ.get("SMSE_BENCH_REPLICAS", "300"))
CORES_LO = int(os.environ.get("SMSE_BENCH_CORES_LO", "8"))

BENCH_QUERIES: list[tuple[str, str, str | None]] = [
    ("q_flagship", "hash join merge scan", None),
    ("q_hot", "the row data column", None),
    ("q_rare_mix", "spark window dup", None),
    ("q_single", "vector", None),
    ("q_lang", "batch stream spark window", "en"),
    ("q_five_terms", "fast slow small merge sort", None),
    ("q_absent_mix", "nonexistentterm join", None),
    ("q_lang_zh", "scan filter order", "zh"),
]


def materialize_corpus(replicas: int, sf_dir: str) -> tuple[str, int]:
    """Write the deterministic scale-up corpus once (untimed prep shared by
    both probes) — a real corpus arrives as many files, so the bench input
    should too, not as a single-partition crossJoin."""
    from smse_backend_spark.corpus import load_corpus, scaled_corpus
    from smse_backend_spark.session import get_spark

    path = f"/tmp/smse_bench_corpus_r{replicas}_{os.path.basename(sf_dir.rstrip('/'))}"
    marker = os.path.join(path, "_SUCCESS")
    spark = get_spark("bench-prep", master="local[16]", shuffle_partitions=16)
    try:
        if not os.path.exists(marker):
            c = scaled_corpus(load_corpus(spark, sf_dir), replicas).repartition(128, "doc_id")
            c.write.mode("overwrite").parquet(path)
        n_docs = spark.read.parquet(path).count()
    finally:
        spark.stop()
    return path, n_docs


def probe(cores: int, corpus_path: str, n_docs: int) -> dict:
    from smse_backend_spark.index.build import build_index
    from smse_backend_spark.index.query import InvertedIndex
    from smse_backend_spark.session import get_spark

    spark = get_spark(f"bench-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=2 * cores)
    corpus = spark.read.parquet(corpus_path)

    out = tempfile.mkdtemp(prefix=f"smse_bench_idx_{cores}_")
    try:
        seg = max(2048, n_docs // 256)
        t0 = time.monotonic()
        build_index(spark, corpus, out, segment_size=seg, n_buckets=16,
                    block_size=128, n_batches=1, known_max_doc=n_docs - 1)
        t_index = time.monotonic() - t0

        idx = InvertedIndex(spark, out)
        # warm-up (JIT/Arrow init) on one query, not timed
        idx.bm25_topk("vector", 10).collect()
        # latency mode: pruned single-query path
        q_times: dict[str, float] = {}
        for name, q, lang in BENCH_QUERIES:
            s = time.monotonic()
            idx.bm25_topk(q, 10, lang).collect()
            q_times[name] = round(time.monotonic() - s, 3)
        # throughput mode: the full batch (x4 repeats) in single jobs
        batch = {i: q for i, (_, q, _lg) in enumerate(BENCH_QUERIES)}
        big_batch = {
            j * len(batch) + i: q for j in range(8) for i, q in batch.items()
        }
        t_q0 = time.monotonic()
        n_hits = idx.bm25_topk_batch(big_batch, 10).count()
        t_query = time.monotonic() - t_q0
        q_times[f"batch_{len(big_batch)}q"] = round(t_query, 3)
        bytes_ = sum(r["bytes"] for r in __import__(
            "smse_backend_spark.index.lineage", fromlist=["read_lineage"]
        ).read_lineage(out))
        return {
            "cores": cores,
            "n_docs": int(n_docs),
            "t_index": round(t_index, 3),
            "t_query": round(t_query, 3),
            "files_per_sec": round(n_docs / t_index, 1),
            "qps": round(len(big_batch) / t_query, 3),
            "batch_hits": n_hits,
            "queries": q_times,
            "index_bytes": bytes_,
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


def main() -> None:
    if len(sys.argv) >= 5 and sys.argv[1] == "--probe":
        print("PROBE_JSON:" + json.dumps(
            probe(int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))))
        return

    corpus_path, n_docs = materialize_corpus(REPLICAS, SF_DIR)

    def run_probe(cores: int) -> dict | None:
        """Each probe in a fresh JVM/process — a reused JVM (leftover heap,
        pinned static configs from the prep session) skews timings ~2x."""
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--probe", str(cores),
             corpus_path, str(n_docs)],
            capture_output=True, text=True, timeout=3600,
        )
        for line in p.stdout.splitlines():
            if line.startswith("PROBE_JSON:"):
                return json.loads(line[len("PROBE_JSON:"):])
        sys.stderr.write(p.stdout[-2000:] + p.stderr[-2000:])
        return None

    hi = run_probe(CPUS)
    result = {
        "metric": "bm25_index_plus_query_sec",
        "value": round(hi["t_index"] + hi["t_query"], 3),
        "unit": "sec",
        "queries": dict(hi["queries"], index_build=hi["t_index"]),
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "index": {"n_docs": hi["n_docs"], "files_per_sec": hi["files_per_sec"],
                  "bytes": hi["index_bytes"]},
        "query": {"qps": hi["qps"]},
    }

    if os.environ.get("SMSE_BENCH_SCALING", "1") != "0" and CORES_LO < CPUS:
        lo = run_probe(CORES_LO)
        if lo:
            t_lo = lo["t_index"] + lo["t_query"]
            t_hi = hi["t_index"] + hi["t_query"]
            result["scaling"] = {
                "cores_lo": CORES_LO, "cores_hi": CPUS,
                "t_lo": round(t_lo, 3), "t_hi": round(t_hi, 3),
                "files_per_sec_lo": lo["files_per_sec"],
                "files_per_sec_hi": hi["files_per_sec"],
                "qps_lo": lo["qps"], "qps_hi": hi["qps"],
                "efficiency": round(t_lo / (t_hi * (CPUS / CORES_LO)), 3),
                "index_efficiency": round(
                    hi["files_per_sec"] / (lo["files_per_sec"] * (CPUS / CORES_LO)), 3),
            }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
