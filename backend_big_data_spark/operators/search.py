"""Parameter-shaped search composition (SURVEY.md §2.7, §3.2, bug B10).

The reference's ``search_photos`` (``queries.py:367-437``) splices filter
branches in Python depending on which params arrive: keyword contains-match,
a 3-form date range, tag membership, then union+distinct and dedup by id.
That pattern — runtime-parameterized *plan construction*, every operator
still declarative — is exactly how DataFrame APIs are meant to be used, so
the engine keeps it, with two fixes:

- B10: tag match uses ``exists(tags, ...)`` membership, not explode — a
  matching row is returned once, not once per matching tag;
- the URL-building Python UDF (F1) is gone (``functions.scalars.photo_url``).
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def keyword_filter(cols: Sequence[Column], keyword: str) -> Column:
    """Case-insensitive substring match OR-ed across columns — reference
    ``queries.py:381-385``. Scale path for selective keywords is a full-text
    index; for scan-shaped search this stays codegen-side."""
    kw = keyword.lower()
    pred = F.lit(False)
    for c in cols:
        pred = pred | F.lower(c).contains(kw)
    return pred


def date_range_filter(
    col: Column, start: datetime | str | None, end: datetime | str | None
) -> Column | None:
    """The reference's 3-form date branch (``queries.py:389-397``) collapsed:
    either bound optional; None when neither given."""
    if start is not None and end is not None:
        return col.between(F.lit(start), F.lit(end))
    if start is not None:
        return col >= F.lit(start)
    if end is not None:
        return col <= F.lit(end)
    return None


def array_membership_filter(arr: Column, values: Sequence[str]) -> Column:
    """B10-fixed tag search: membership via ``exists`` (no explode, no row
    duplication) — replaces ``queries.py:400-413``."""
    pred = F.lit(False)
    for v in values:
        pred = pred | F.array_contains(arr, v)
    return pred


def union_distinct_by_key(branches: Sequence[DataFrame], key: str) -> DataFrame:
    """Union of match branches deduplicated by key — reference U1
    (``queries.py:409-416``) with ``unionByName`` (schema-safe) instead of
    positional union."""
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    return out.dropDuplicates([key])
