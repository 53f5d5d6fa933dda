"""Shared exactly-once plumbing for the foreachBatch curation stages.

Three streaming stages (exact curation, near-dup, semantic dedup) ride
the same two mechanisms; one definition here so a protocol change —
sidecar validation, corrupt-file handling — cannot silently drift
between them:

- :func:`stream_app_id` — stream-LIFETIME identity. foreachBatch batch
  ids restart at 0 whenever a query starts from a fresh checkpoint
  directory, so a watermark keyed on the bare app id would silently
  skip every batch whose id is <= the cursor a PREVIOUS checkpoint
  lifetime committed (fresh checkpoint pointed at existing tables =
  data loss). The fix: a uuid minted once per checkpoint directory
  (atomic sidecar inside it) suffixes the app id, so a new checkpoint
  is a new watermark namespace — the stream reprocesses from scratch,
  which is the correct semantics for "start over" — while restarts of
  the SAME checkpoint keep exactly-once.
- :func:`txn_behind` — per-table batch-id txn watermark (the
  :meth:`~moisturizer_spark.storage.ParquetTable.txn_version` cursor).
- :func:`index_watermark` / :func:`bump_index_watermark` — the atomic
  (write-temp + ``os.replace``) JSON sidecar watermark for persisted
  INDEX appends, which are parquet appends rather than keyed upserts
  and so cannot carry a table txn. The sidecar records the (suffixed)
  app id; a mismatch reads as "no watermark", same namespace rule.
"""

from __future__ import annotations

import json
import os
import uuid

from moisturizer_spark.storage import ParquetTable

TXN_FILE = "_stream_txn.json"
STREAM_ID_FILE = "_moisturizer_stream_id.json"


def stream_app_id(base_app_id: str, checkpoint_dir: str) -> str:
    """``base_app_id:<uuid12>`` with the uuid read-or-minted atomically
    inside ``checkpoint_dir`` — call once at stream START (driver side,
    before ``writer.start()``) and use the result for every watermark
    this stream writes or reads."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, STREAM_ID_FILE)
    try:
        with open(path) as fh:
            sid = json.load(fh)["stream_id"]
    except FileNotFoundError:
        sid = uuid.uuid4().hex[:12]
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"stream_id": sid}, fh)
        os.replace(tmp, path)
    return f"{base_app_id}:{sid}"


def txn_behind(table: ParquetTable, app_id: str, batch_id: int) -> bool:
    v = table.txn_version(app_id)
    return v is None or v < batch_id


def index_watermark(path: str, app_id: str) -> int | None:
    """Applied-batch cursor for ``app_id``; None when absent OR written
    by a different stream lifetime (checkpoint replaced -> batch ids
    restarted -> the old cursor must not suppress the new stream)."""
    try:
        with open(os.path.join(path, TXN_FILE)) as fh:
            rec = json.load(fh)
    except FileNotFoundError:
        return None
    if rec.get("app") != app_id:
        return None
    return rec["applied_batch"]


def bump_index_watermark(path: str, app_id: str, batch_id: int) -> None:
    tmp = os.path.join(path, TXN_FILE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"app": app_id, "applied_batch": batch_id}, fh)
    os.replace(tmp, os.path.join(path, TXN_FILE))
