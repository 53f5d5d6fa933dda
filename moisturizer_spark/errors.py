"""Typed errors mirroring the reference's observable failure modes.

The reference returns HTTP 400 for validation failures and 403 for
permission / unknown-type access (reference ``tests/test_views.py:214-219,
229-231, 373-440``) and its tests demand a typed exception for schema
conflicts (reference ``tests/test_models.py:80`` "FIXME: We need a typed
exception here" — we provide it).
"""

from __future__ import annotations


class MoisturizerError(Exception):
    """Base error for the engine."""

    status = 500


class ValidationError(MoisturizerError):
    """Payload violates the type's declared/inferred schema (HTTP 400)."""

    status = 400


class SchemaConflictError(ValidationError):
    """A field was re-inferred with an incompatible (type, format).

    The reference *raises* rather than widening (reference
    ``tests/test_models.py:65-83``); Spark's native JSON inference widens,
    so conflict detection is implemented explicitly in
    :mod:`moisturizer_spark.typesys`.
    """


class TypeNotFound(MoisturizerError):
    """Unknown type id. The reference conflates this with permissions and
    returns 403 (reference ``tests/test_views.py:229-231``)."""

    status = 403


class ObjectNotFound(MoisturizerError):
    """No object with the given id in the type's table (HTTP 404)."""

    status = 404


class PermissionDenied(MoisturizerError):
    """User lacks the read/create/write flag for this type (HTTP 403)."""

    status = 403


class InvalidEnvelope(ValidationError):
    """Event envelope missing required ``type_id``
    (reference ``moisturizer/consumer.py:33-35``)."""
