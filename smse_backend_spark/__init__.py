"""smse_backend_spark — a PySpark-native inverted-index + BM25 search engine.

A from-scratch re-expression of the search core of ``smse-org/SMSE-Backend``
(Flask + SQLAlchemy + pgvector + Celery; reference snapshot at
``/root/reference``) as idiomatic Spark DataFrame pipelines:

- ingest: corpus snapshot with per-row ``sha256(content)`` invariant
  (reference blob ingest, ``smse_backend/routes/content.py:18-104``)
- index: SPIMI-style segment-partitioned posting-list construction with
  delta-gap + varint compressed block-max blocks
- query: BM25 (k1=1.2, b=0.75) top-k with total-order tie-break
  ``(score desc, doc_id asc)`` — the analog of the reference's pgvector
  cosine top-k (``smse_backend/services/search.py:77-132``)
- persistence: queries / search_records tables
  (``smse_backend/models/query.py``, ``models/search_record.py``)

Nothing here is a port: the reference delegates scan+join+top-k to
PostgreSQL; this engine declares the same semantics as DataFrame plans and
lets Catalyst/Tungsten execute them, adding the distributed index the
reference lacks.
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
DEFAULT_TOP_K = 10  # reference default: smse_backend/routes/search.py:23
