"""Batch enrichment via an external REST API — the reference's
``update_dataset.py`` (SURVEY.md §2.1 S8, §2.9 F2-F6) redesigned for scale.

The reference applies FIVE row-at-a-time Python UDFs, each opening an HTTP
request per row (``update_dataset.py:90-134,139-157``) — that is a Python
worker round-trip AND a TCP handshake per row per field. Here one
``mapInPandas`` pass enriches a whole Arrow batch with ONE fetcher instance
per partition (connection/session reuse), returning all enriched fields at
once; struct fields are rebuilt with ``withField`` instead of re-listing
every member (``update_dataset.py:141-153``).

The fetcher is injected: production supplies an HTTP client; tests (and
this offline container) use ``DeterministicFakeFetcher``. The Spark-side
plumbing — batch shape, schema, struct rebuild — is identical either way.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fetcher(photo_id) -> (comments, has_people, owner_pro, make, model)
Fetcher = Callable[[str], tuple[int, bool, bool, str, str]]


class DeterministicFakeFetcher:
    """Offline stand-in for the Flickr REST API (the container has no
    network): every field derives from a hash of the photo id, so results
    are reproducible and assertable. Mirrors the shapes of
    ``flickrapi_utils.py`` getInfo/getSizes responses."""

    def __call__(self, photo_id: str) -> tuple[int, bool, bool, str, str]:
        import hashlib

        # md5, not hash(): Python string hashing is salted per process, and
        # executors don't share the driver's seed
        h = int.from_bytes(
            hashlib.md5(str(photo_id).encode()).digest()[:4], "big"
        )
        return (
            h % 50,
            bool(h & 1),
            bool(h & 2),
            f"Make{h % 5}",
            f"Model{h % 7}",
        )


def http_fetcher(*_args, **_kwargs):
    """Production fetcher factory — requires network access and a Flickr
    API key; deliberately unimplemented in this offline environment."""
    raise NotImplementedError(
        "live REST enrichment needs network access; inject your own Fetcher "
        "(a requests.Session-backed callable) or use DeterministicFakeFetcher"
    )


def enrich_photos(
    df: DataFrame, fetcher_factory: Callable[[], Fetcher]
) -> DataFrame:
    """One-pass batch enrichment of (comments, hasPeople, owner.pro,
    camera_info) — replacing reference UDFs F3-F6.

    ``fetcher_factory`` is called once per Arrow batch iterator (i.e. once
    per task), NOT per row — that is where connection reuse lives. Output
    schema == input schema, so the job is idempotent and re-runnable.
    """
    fields = [
        ("__comments", "int"),
        ("__has_people", "boolean"),
        ("__owner_pro", "boolean"),
        ("__make", "string"),
        ("__model", "string"),
    ]
    out_schema = ", ".join(
        [f"id string"] + [f"{n} {t}" for n, t in fields]
    )

    def fetch_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        fetcher = fetcher_factory()  # one client per task
        for pdf in batches:
            fetched = [fetcher(pid) for pid in pdf["id"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "__comments": [f[0] for f in fetched],
                    "__has_people": [f[1] for f in fetched],
                    "__owner_pro": [f[2] for f in fetched],
                    "__make": [f[3] for f in fetched],
                    "__model": [f[4] for f in fetched],
                }
            )

    # Only the id column rides through Python; the enriched columns join
    # back on id (shuffle equi-join — both sides hash-partition on the same
    # narrow key; never broadcast: the enriched side is table-sized).
    enriched = df.select("id").mapInPandas(fetch_batches, schema=out_schema)
    joined = df.join(enriched, on="id", how="left")
    return (
        joined.withColumn("comments", F.col("__comments"))
        .withColumn("hasPeople", F.col("__has_people"))
        .withColumn("owner", F.col("owner").withField("pro", F.col("__owner_pro")))
        .withColumn(
            "camera_info",
            F.struct(
                F.col("__make").alias("make"), F.col("__model").alias("model")
            ),
        )
        .drop(*[n for n, _ in fields])
        .select(*df.columns)  # restore original column order (join moved id)
    )
