"""Content hashing — the reference's identity scheme (SURVEY §2.2 P1/P2).

The reference keys every cache layer on hex sha256 of stage input
(``backend/filters/preprocessFilter.js:17-21``, ``ocrFilter.js:23-28``,
``translateFilter.js:32-34``) and dedups whole requests on a composite
``sha256(buffer ‖ targetLang ‖ outputFormat)`` (``cacheFilter.js:8-13``).

Divergence note: the reference concatenates raw bytes with no separator;
we join with an explicit 0x1F unit separator so distinct column tuples
can never collide by concatenation — semantically stronger, and easy to
reproduce in any SQL oracle via ``concat_ws``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

COMPOSITE_SEP = "\x1f"


def sha256_hex(col: Column | str) -> Column:
    """Hex sha256 of a string/binary column (P1)."""
    return F.sha2(F.col(col) if isinstance(col, str) else col, 256)


def composite_key(*cols: Column | str, sep: str = COMPOSITE_SEP) -> Column:
    """Multi-column content key (P2) — sha256 over separator-joined parts.

    NULL parts are treated as empty strings (concat_ws semantics), matching
    the reference's ``buffer ‖ (targetLang||'') ‖ fmt`` behavior.
    """
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.sha2(F.concat_ws(sep, *parts), 256)


def spans_content_hash(spans: Column | str, sep: str = COMPOSITE_SEP) -> Column:
    """Canonical content identity of a span array — offset-sorted, NULL-safe.

    Byte-for-byte equal to :func:`ktpm___ocr_spark.oracle.doc_content_hash`:
    sha256 over ``kind␟text␟media_ref␟offset␞`` per span in OFFSET order
    (trailing ␞ after every span, NULLs as empty strings). Sorting before
    hashing makes content-identical documents hash equal regardless of the
    physical array order they arrive in — the span-sequence invariant is a
    property of (offset, …) tuples, not of array position.
    """
    s = F.col(spans) if isinstance(spans, str) else spans
    ordered = F.array_sort(s, lambda l, r: l["offset"] - r["offset"])
    canon = F.transform(
        ordered,
        lambda x: F.concat(
            F.concat_ws(
                sep,
                F.coalesce(x["kind"], F.lit("")),
                F.coalesce(x["text"], F.lit("")),
                F.coalesce(x["media_ref"], F.lit("")),
                x["offset"].cast("string"),
            ),
            F.lit("\x1e"),
        ),
    )
    return F.sha2(F.array_join(canon, ""), 256)


def hash_priority(*cols: Column | str, content: Column | str | None = None) -> Column:
    """Hash-priority coalesce (P12): first non-null precomputed hash, else
    sha256 of the content itself (``pdfFilter.js:16-21``)."""
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    if content is not None:
        parts.append(sha256_hex(content))
    return F.coalesce(*parts)
