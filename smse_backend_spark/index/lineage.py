"""Per-partition build lineage — the resumability/checkpoint layer.

Maps the reference's Celery task lifecycle (``tasks`` table: PENDING ->
SUCCESS with result payload, smse_backend/models/task.py:6-34 and
routes/task.py:24-69) onto data-plane manifests: one JSON file per
committed batch, written *after* the batch's data files. A batch is
committed iff its lineage file exists — rerunning the build skips committed
batches and overwrites any half-written uncommitted batch directory, so a
crash at any point is recoverable by simply re-invoking the build.

This doubles as the Iceberg-snapshot stand-in (the Iceberg runtime jar is
not available offline; the contract — commit-by-manifest, snapshot listing,
metadata columns — is preserved behind this one module, mirroring the
reference's swappable StorageBackend, smse_backend/services/
file_storage.py:32-73).
"""

from __future__ import annotations

import json
import os

LINEAGE_DIR = "lineage"
META_FILE = "meta.json"


def _lineage_dir(index_dir: str) -> str:
    return os.path.join(index_dir, LINEAGE_DIR)


def committed_batches(index_dir: str) -> set[int]:
    d = _lineage_dir(index_dir)
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("batch_") and name.endswith(".json"):
            out.add(int(name[len("batch_"):-len(".json")]))
    return out


def commit_batch(index_dir: str, batch_id: int, **fields) -> dict:
    """Write the lineage row for a batch (the commit point)."""
    d = _lineage_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    row = {"batch_id": batch_id, "status": "COMMITTED", **fields}
    tmp = os.path.join(d, f".batch_{batch_id}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(row, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(d, f"batch_{batch_id}.json"))
    return row


def read_lineage(index_dir: str) -> list[dict]:
    d = _lineage_dir(index_dir)
    rows = []
    for b in sorted(committed_batches(index_dir)):
        with open(os.path.join(d, f"batch_{b}.json")) as f:
            rows.append(json.load(f))
    return rows


def write_meta(index_dir: str, meta: dict) -> None:
    tmp = os.path.join(index_dir, "." + META_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(index_dir, META_FILE))


def read_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, META_FILE)) as f:
        return json.load(f)


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for name in files:
            total += os.path.getsize(os.path.join(root, name))
    return total
