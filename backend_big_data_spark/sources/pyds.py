"""Custom Python DataSource (Spark 4 DataSource API) — a partitioned
external-catalog reader with source-side filter pushdown.

The reference's only non-file source is a driver-side REST fetch
(SURVEY §2.1 S8); the engine's mapInPandas enrichment covers that shape.
This module covers the other half a production engine needs: an EXTERNAL
SYSTEM exposed as a first-class, partition-parallel, filter-pushing table
via ``spark.read.format(...)`` — Spark 4's Python DataSource API
(``pyspark.sql.datasource``), the idiomatic way to wrap a sharded REST/DB
catalog without writing a JVM connector.

The backing "service" here is a deterministic in-process generator (the
sandbox has no network), but the Spark-facing machinery is real and
tested: schema declaration, one ``InputPartition`` per remote shard (the
unit of parallel fetch), and ``pushFilters`` consuming the predicates a
remote catalog can evaluate (shard equality → fetch only that shard;
event_type equality → server-side filter) while returning the rest for
Spark to apply. At 100 TB this is the difference between dragging every
shard through the cluster and opening exactly the connections the query
needs — the same scan-pruning discipline the parquet paths get from
Catalyst, extended to external systems.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: Deterministic event-type cycle for the fake service (shared with tests).
EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


def _shard_rows(shard: int, rows_per_shard: int) -> Iterator[tuple]:
    """The fake remote shard: deterministic rows keyed by (shard, seq)."""
    for seq in range(rows_per_shard):
        event_id = shard * rows_per_shard + seq
        etype = EVENT_TYPES[(shard + seq) % len(EVENT_TYPES)]
        value = round((event_id * 37 % 1000) / 10.0, 1)
        yield (event_id, shard, etype, value)


class CatalogShardReader(DataSourceReader):
    def __init__(self, options: dict):
        # Spark lowercases DataSource option keys (CaseInsensitiveDict)
        opts = {k.lower(): v for k, v in options.items()}
        self.num_shards = int(opts.get("shards", 4))
        self.rows_per_shard = int(opts.get("rowspershard", 100))
        #: predicates the "service" evaluates remotely
        self.shard_eq: int | None = None
        self.type_eq: str | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        """Consume shard/event_type equality (the service's query params);
        everything else is returned for Spark to evaluate post-scan."""
        remaining = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("shard",):
                self.shard_eq = int(f.value)
            elif isinstance(f, EqualTo) and f.attribute == ("event_type",):
                self.type_eq = str(f.value)
            else:
                remaining.append(f)
        return remaining

    def partitions(self) -> list[InputPartition]:
        """One partition per remote shard — shard-equality pushdown prunes
        the fetch list itself, not just the rows."""
        shards = (
            [self.shard_eq]
            if self.shard_eq is not None
            else list(range(self.num_shards))
        )
        return [InputPartition(s) for s in shards]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        shard = partition.value
        for row in _shard_rows(shard, self.rows_per_shard):
            if self.type_eq is not None and row[2] != self.type_eq:
                continue
            yield row


class CatalogDataSource(DataSource):
    """``spark.read.format("sharded_catalog")`` — register with
    ``spark.dataSource.register(CatalogDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "sharded_catalog"

    def schema(self) -> str:
        return "event_id bigint, shard int, event_type string, value double"

    def reader(self, schema) -> CatalogShardReader:
        return CatalogShardReader(dict(self.options))

    def simpleStreamReader(self, schema) -> "CatalogStreamReader":
        return CatalogStreamReader(dict(self.options))


def register(spark) -> None:
    # runtime SQLConf: off by default in Spark 4.1; required for
    # pushFilters to be consulted at plan time
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CatalogDataSource)


__all__ = [
    "CatalogDataSource",
    "CatalogShardReader",
    "CatalogStreamReader",
    "EVENT_TYPES",
    "register",
]


# ---------------------------------------------------------------------------
# Streaming variant: the same catalog as an exactly-once offset-based stream
# ---------------------------------------------------------------------------


class CatalogStreamReader(SimpleDataSourceStreamReader):
    """Offset-based streaming read of the catalog: the offset is a single
    monotonically increasing row sequence number per shard-interleaved
    order (``{"pos": n}``), each micro-batch drains up to
    ``rowsPerBatch`` new rows. ``readBetweenOffsets`` replays any
    (start, end) range deterministically — this is what gives a custom
    Python source exactly-once REPLAY under checkpoint recovery; Spark
    persists the offsets, the source just honors them.
    """

    def __init__(self, options: dict):
        opts = {k.lower(): v for k, v in options.items()}
        self.total_rows = int(opts.get("totalrows", 40))
        self.rows_per_batch = int(opts.get("rowsperbatch", 10))
        self.rows_per_shard = int(opts.get("rowspershard", 100))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _rows(self, start: int, end: int):
        for event_id in range(start, end):
            shard = event_id // self.rows_per_shard
            seq = event_id % self.rows_per_shard
            etype = EVENT_TYPES[(shard + seq) % len(EVENT_TYPES)]
            value = round((event_id * 37 % 1000) / 10.0, 1)
            yield (event_id, shard, etype, value)

    def read(self, start: dict):
        lo = start["pos"]
        hi = min(lo + self.rows_per_batch, self.total_rows)
        # iter(list): the wrapper advances it (needs an iterator) AND
        # pickles it for prefetch/replay bookkeeping (a generator cannot
        # pickle; a list_iterator can)
        return iter(list(self._rows(lo, hi))), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._rows(start["pos"], end["pos"])))

    def commit(self, end: dict) -> None:
        pass  # nothing external to acknowledge for the synthetic service
