"""Language-code normalization + empty-text skip (SURVEY §2.2 P7/P8).

Reference: tesseract-style codes map to translator codes
``{vie→vi, eng→en, fra→fr, jp→ja, kor→ko}``, unknown codes pass through,
null falls back to ``vi`` (``backend/utils/translate.js:38-39``); blank
text skips the translate stage entirely and passes through unchanged
(``translateFilter.js:19-30``, ``translate.js:35``).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column
from pyspark.sql import functions as F

LANG_MAP = {"vie": "vi", "eng": "en", "fra": "fr", "jp": "ja", "kor": "ko"}
DEFAULT_TARGET = "vi"


def normalize_lang(col: Column | str) -> Column:
    """Map known codes, pass through unknown, default ``vi`` for NULL."""
    c = F.col(col) if isinstance(col, str) else col
    m = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(LANG_MAP.items())]
    )
    return F.coalesce(F.element_at(m, c), c, F.lit(DEFAULT_TARGET))


def skip_if_blank(text: Column | str, transformed: Column) -> Column:
    """P7: if trim(text) is empty (or text NULL) keep the original text,
    else use the transformed value."""
    t = F.col(text) if isinstance(text, str) else text
    return F.when(
        t.isNull() | (F.trim(t) == F.lit("")), t
    ).otherwise(transformed)
