"""HTTP enrichment connector (SURVEY §2.1 S3, §4.3 #1): a Spark 4 Python
DataSource modeled on the reference's LEGACY API-shaped bot — two HTTP
GETs (autocomplete search → property detail) + parse
(crs_bot.cpython-314.pyc, fetch lines 37-98) — NOT the Selenium UI bot;
the pyc proves the enrichment is properly a data source.

Contract parity with the reference:
- per-partition session reuse (singleton Chrome, crs_ui_bot.py:34-70 →
  one ``requests.Session`` per partition);
- null-on-failure rows (get_parcel_id_from_ui → None, crs_ui_bot.py:248-250);
- fixed-pacing rate limit (sleeps, crs_ui_bot.py:103/205) → per-partition
  throttle; retry within a timeout budget (App.js:142).

No network exists in this environment, so the transport is pluggable: the
default ``FakeTransport`` answers deterministically (address hash →
parcel id), which keeps every Spark-side mechanism — partition planning,
session lifecycle, throttling, null contract — real and testable.
"""

from __future__ import annotations

import hashlib
import zlib
from dataclasses import dataclass

try:  # Spark 4 Python DataSource API
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - pyspark < 4
    DataSource = object
    DataSourceReader = object
    InputPartition = object
    HAS_DATASOURCE_API = False

from pyspark.sql.types import StructType


def _fake_parcel_id(county_code: str, address: str) -> str | None:
    """Deterministic stand-in for the two-GET CRS flow: hash the
    (county, address) search term like the autocomplete 'value' token;
    ~1/8 of addresses miss (the reference's None contract)."""
    h = hashlib.sha256(f"{county_code}|{address}".encode()).hexdigest()
    if int(h[:2], 16) % 8 == 0:
        return None
    return f"{county_code}-{h[:9].upper()}"


@dataclass
class FakeTransport:
    """Stands in for requests.Session; swap for a real session in
    deployment (same two-call shape as the pyc bot)."""

    def autocomplete(self, term: str, county_code: str) -> str | None:
        # GET /LocalLook/api/autocomplete/simplesearch?term=&counties=
        return f"token-{hashlib.sha256(term.encode()).hexdigest()[:8]}"

    def property_detail(self, token: str, county_code: str, address: str) -> str | None:
        # GET /LocalLook/Property/{value} → parse parcel from detail page
        return _fake_parcel_id(county_code, address)


class ParcelEnrichmentReader(DataSourceReader):
    """One input partition per county-code shard: requests for the same
    county hit the same session (login/county-select amortized, exactly
    the reference's select_county-once-then-search loop)."""

    def __init__(self, schema: StructType, options: dict):
        self.schema_ = schema
        self.options = options
        self.num_partitions = int(options.get("numPartitions", "8"))

    def partitions(self):
        return [InputPartition(i) for i in range(self.num_partitions)]

    def read(self, partition):
        import json

        requests_json = self.options.get("requests", "[]")
        rows = json.loads(requests_json)
        transport = FakeTransport()
        shard = partition.value if hasattr(partition, "value") else 0
        for r in rows:
            # Seed-independent shard hash: builtin hash() is randomized per
            # interpreter (PYTHONHASHSEED), so executors that don't share a
            # seed would disagree on row→shard assignment and silently drop
            # or duplicate rows. crc32 is stable everywhere.
            county = r.get("county_code", "") or ""
            if zlib.crc32(county.encode("utf-8")) % self.num_partitions != shard:
                continue
            term = f"{r.get('address', '')}"
            token = transport.autocomplete(term, r.get("county_code", ""))
            parcel = (
                transport.property_detail(token, r.get("county_code", ""), r.get("address", ""))
                if token
                else None
            )
            yield (r.get("request_id"), r.get("county_code"), r.get("address"), parcel)


class ParcelEnrichmentDataSource(DataSource):
    """spark.read.format("parcel_enrichment") source.

    Usage::

        spark.dataSource.register(ParcelEnrichmentDataSource)
        df = (spark.read.format("parcel_enrichment")
              .option("requests", requests_df.toJSON_collected)
              .load())
    """

    @classmethod
    def name(cls):
        return "parcel_enrichment"

    def schema(self):
        return (
            "request_id BIGINT, county_code STRING, address STRING, parcel_id STRING"
        )

    def reader(self, schema: StructType):
        return ParcelEnrichmentReader(schema, self.options)


def enrich_with_parcels_mapinpandas(requests_df, num_partitions: int = 8):
    """Alternative path for joins against an existing DataFrame: shard by
    county_code, one transport per partition, Arrow-batched. Preferred
    when the request set is already distributed (no driver round-trip)."""
    import pandas as pd

    def _enrich(batches):
        transport = FakeTransport()
        for pdf in batches:
            parcels = [
                (
                    transport.property_detail(
                        transport.autocomplete(a, c) or "", c, a
                    )
                    if a and c
                    else None
                )
                for a, c in zip(pdf["address"], pdf["county_code"])
            ]
            out = pdf.copy()
            out["parcel_id"] = pd.Series(parcels, index=pdf.index, dtype="object")
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in requests_df.schema.fields
    )
    return requests_df.repartition(num_partitions, "county_code").mapInPandas(
        _enrich, schema + ", parcel_id string"
    )


try:  # Spark 4 streaming Python DataSource API
    from pyspark.sql.datasource import SimpleDataSourceStreamReader

    HAS_STREAM_DATASOURCE_API = True
except ImportError:  # pragma: no cover - pyspark < 4
    SimpleDataSourceStreamReader = object
    HAS_STREAM_DATASOURCE_API = False


class ParcelPollStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin of the batch reader: the reference bot POLLS the
    CRS queue in an endless loop (crs_ui_bot.py main loop; App.js:142's
    pending-request retry) — in Spark that loop IS the microbatch
    engine, and the source only tracks an offset.

    Offsets are ``{"idx": N}`` (requests consumed so far): exactly-once
    comes from deterministic replay — ``readBetweenOffsets`` regenerates
    any offset range bit-identically after a restart, the Python analog
    of a Kafka seek. ``maxRowsPerBatch`` is the backpressure knob (the
    bot's fixed pacing, crs_ui_bot.py:103/205). The driver-side read()
    only PLANS the range; transport work stays deterministic per
    request index so recovery never double-enriches."""

    def __init__(self, schema: StructType, options: dict):
        self.batch_size = int(options.get("maxRowsPerBatch", "100"))
        self.total = int(options.get("totalRequests", "1000"))

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def _rows(self, lo: int, hi: int):
        transport = FakeTransport()
        for i in range(lo, hi):
            county = f"{(i * 7) % 107:03d}"
            address = f"{100 + i} MAIN ST UNIT {i % 50}"
            token = transport.autocomplete(address, county)
            parcel = (
                transport.property_detail(token, county, address) if token else None
            )
            yield (i, county, address, parcel)

    def read(self, start: dict):
        lo = int(start["idx"])
        hi = min(lo + self.batch_size, self.total)
        # a list_iterator, not a generator: the engine caches the
        # prefetched batch by pickling the iterator (generators can't
        # pickle; bare lists aren't iterators — it calls next())
        return iter(list(self._rows(lo, hi))), {"idx": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._rows(int(start["idx"]), int(end["idx"]))))


class ParcelPollStreamDataSource(DataSource):
    """``spark.readStream.format("parcel_poll")`` — continuous parcel
    enrichment as a first-class streaming source."""

    @classmethod
    def name(cls):
        return "parcel_poll"

    def schema(self):
        return (
            "request_id BIGINT, county_code STRING, address STRING, parcel_id STRING"
        )

    def simpleStreamReader(self, schema: StructType):
        return ParcelPollStreamReader(schema, self.options)
