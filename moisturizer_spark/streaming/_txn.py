"""Shared exactly-once plumbing for the foreachBatch curation stages.

Three streaming stages (exact curation, near-dup, semantic dedup) ride
the same two mechanisms; one definition here so a protocol change —
sidecar validation, corrupt-file handling — cannot silently drift
between them:

- :func:`txn_behind` — per-table batch-id txn watermark (the
  :meth:`~moisturizer_spark.storage.ParquetTable.txn_version` cursor).
- :func:`index_watermark` / :func:`bump_index_watermark` — the atomic
  (write-temp + ``os.replace``) JSON sidecar watermark for persisted
  INDEX appends, which are parquet appends rather than keyed upserts
  and so cannot carry a table txn.
"""

from __future__ import annotations

import json
import os

from moisturizer_spark.storage import ParquetTable

TXN_FILE = "_stream_txn.json"


def txn_behind(table: ParquetTable, app_id: str, batch_id: int) -> bool:
    v = table.txn_version(app_id)
    return v is None or v < batch_id


def index_watermark(path: str) -> int | None:
    try:
        with open(os.path.join(path, TXN_FILE)) as fh:
            return json.load(fh)["applied_batch"]
    except FileNotFoundError:
        return None


def bump_index_watermark(path: str, app_id: str, batch_id: int) -> None:
    tmp = os.path.join(path, TXN_FILE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump({"app": app_id, "applied_batch": batch_id}, fh)
    os.replace(tmp, os.path.join(path, TXN_FILE))
