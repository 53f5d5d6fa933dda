"""Nested-object flattening with ``__`` separator.

Reference semantics (``moisturizer/schemas.py:37-43`` via flatten_json):
``{'a': {'b': 1}}`` → column ``a__b``; ``None`` values dropped entirely;
``unflatten`` reproduces the nested shape minus nulls. Known limitation
carried over: field names containing ``__`` collide (the reference ignores
this too).

Two surfaces:

- :func:`flatten_dict` / :func:`unflatten_dict` — driver-side, used by the
  per-object CRUD path.
- :func:`flatten_df` / :func:`unflatten_df` — DataFrame-level, pure
  ``select`` projections generated from the schema, so they run JVM-side
  with zero Python per-row cost (the scale path for bulk ingest).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

SEP = "__"


def flatten_dict(obj: dict, sep: str = SEP, _prefix: str = "") -> dict:
    """Recursively flatten nested dicts; drop None leaves."""
    out: dict = {}
    for key, value in obj.items():
        full = f"{_prefix}{sep}{key}" if _prefix else str(key)
        if isinstance(value, dict):
            out.update(flatten_dict(value, sep=sep, _prefix=full))
        elif value is not None:
            out[full] = value
    return out


def unflatten_dict(flat: dict, sep: str = SEP) -> dict:
    """Inverse of :func:`flatten_dict` (nulls stay dropped)."""
    out: dict = {}
    for key, value in flat.items():
        if value is None:
            continue
        parts = key.split(sep)
        node = out
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return out


def _flat_columns(schema: T.StructType, prefix: str = "") -> list[tuple[str, str]]:
    """(nested_path, flat_name) pairs for every leaf of a StructType."""
    cols: list[tuple[str, str]] = []
    for field in schema.fields:
        path = f"{prefix}.{field.name}" if prefix else field.name
        flat = path.replace(".", SEP)
        if isinstance(field.dataType, T.StructType):
            cols.extend(_flat_columns(field.dataType, path))
        else:
            cols.append((path, flat))
    return cols


def flatten_df(df: DataFrame) -> DataFrame:
    """Flatten all struct columns into ``__``-named top-level columns.

    Pure projection — Catalyst collapses it into the scan, so nested
    parquet columns are still pruned to only the leaves referenced
    downstream.
    """
    cols = [F.col(path).alias(flat) for path, flat in _flat_columns(df.schema)]
    return df.select(*cols)


def unflatten_df(df: DataFrame) -> DataFrame:
    """Rebuild structs from ``__``-named flat columns (read path)."""
    tree: dict = {}
    for name in df.columns:
        parts = name.split(SEP)
        node = tree
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = name

    def build(node, prefix: str):
        if isinstance(node, str):
            return F.col(node)
        return F.struct(
            *[build(child, f"{prefix}.{k}").alias(k) for k, child in node.items()]
        )

    return df.select(*[build(child, key).alias(key) for key, child in tree.items()])
