"""REST time-series source as a real PySpark custom data source (S7).

The reference fetches the OSRS-wiki price API one item per request on a
cron box and appends to SQLite (`src/4_fetch_item_prices.py:54-82`
``get_wiki_timeseries``, ``:131-143`` table shape, ``:206-219``
per-item watermark append).  Re-expressed Spark-first, the fetch layer
IS a data source: ``spark.read.format("rest_timeseries")`` plans one
input partition per chunk of item ids, so a 10k-item catalog fans out
across the cluster while each task stays a polite, rate-limited HTTP
client.  Everything downstream (watermark filtering, dedup append,
as-of joins) is the existing relational pipeline — the source's only
job is to turn paginated GETs into partitioned rows.

Scale + politeness model:

- **Partitioning**: ``items_per_partition`` ids per task (default 50).
  Parallelism = ceil(items / chunk); at 1000 executors the catalog
  fetch is embarrassingly parallel and each task holds O(chunk) rows.
- **Rate limiting**: a token bucket per partition
  (``rate_limit_rps``, default 2.0 req/s).  The GLOBAL request rate is
  ``rate_limit_rps × concurrent tasks`` — size one against the other;
  the docstring math is the contract, mirroring the reference's
  explicit per-request politeness sleep.
- **Transport injection**: HTTP happens behind a
  ``transport(url, headers) -> list[dict]`` callable resolved from a
  dotted ``module:function`` option, so executors import it locally
  (options must be strings).  The default is this module's
  deterministic fake (no network in tests); ``requests_transport``
  is the real client (import-guarded — the reference requires a
  descriptive User-Agent, enforced here too).

The fake transport derives every field from ``md5(item_id:epoch)`` so
a SQL oracle can reproduce the exact rows cross-engine — that is what
makes the source hash-checkable end-to-end in the driver gate.
"""

from __future__ import annotations

import hashlib
import time
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Matches the reference item_prices table (4_fetch_item_prices.py:131-143)
# minus item_name (a broadcast-dimension join concern, S8 — not the
# fetcher's).  timestamp is epoch seconds exactly as the API returns it.
PRICE_SCHEMA = StructType(
    [
        StructField("item_id", IntegerType(), False),
        StructField("timestamp", LongType(), False),
        StructField("avg_high_price", LongType(), True),
        StructField("avg_low_price", LongType(), True),
        StructField("high_price_volume", LongType(), True),
        StructField("low_price_volume", LongType(), True),
    ]
)

# Fixed anchor for the deterministic fake series: 2024-01-01 00:00 UTC.
FAKE_EPOCH0 = 1704067200
FAKE_STEP = 86400


def fake_point(item_id: int, ts: int) -> tuple[int, int, int, int]:
    """(avg_high, avg_low, high_vol, low_vol) for one fake sample —
    every field a function of ``md5(f"{item_id}:{ts}")`` so DuckDB can
    rebuild it:  ``CAST(('0x' || substr(md5(item_id || ':' || ts), 1,
    8)) AS BIGINT)`` then the same mod/div arithmetic."""
    h = int(hashlib.md5(f"{item_id}:{ts}".encode()).hexdigest()[:8], 16)
    return (h % 100000, (h // 7) % 100000, h % 1000, (h // 13) % 1000)


def fake_transport(url: str, headers: dict[str, str]) -> list[dict]:
    """Deterministic stand-in for the wiki API: parses ``id=``, ``n=``
    and the optional ``from=`` epoch from the URL and emits ``n``
    daily samples starting there (the API's 5m/1h ``from`` paging,
    which the stream reader uses for offset windows)."""
    params = dict(
        kv.split("=", 1) for kv in url.split("?", 1)[1].split("&") if "=" in kv
    )
    item_id = int(params["id"])
    n = int(params.get("n", "30"))
    start = int(params.get("from", FAKE_EPOCH0))
    out = []
    for i in range(n):
        ts = start + i * FAKE_STEP
        hi, lo, hv, lv = fake_point(item_id, ts)
        out.append(
            {
                "timestamp": ts,
                "avgHighPrice": hi,
                "avgLowPrice": lo,
                "highPriceVolume": hv,
                "lowPriceVolume": lv,
            }
        )
    return out


def requests_transport(url: str, headers: dict[str, str]) -> list[dict]:
    """Real HTTP client (reference get_wiki_timeseries semantics:
    raise on HTTP error, `.data` payload, 15s timeout)."""
    import requests  # import-guarded: not all containers ship it

    resp = requests.get(url, headers=headers, timeout=15)
    resp.raise_for_status()
    return resp.json().get("data", [])


def _resolve_transport(spec: str):
    mod_name, _, fn_name = spec.partition(":")
    mod = __import__(mod_name, fromlist=[fn_name])
    return getattr(mod, fn_name)


class TokenBucket:
    """Per-task request throttle: ``rate`` tokens/s, burst of 1.
    ``acquire`` sleeps just enough to honor the rate; a monotonic
    clock so wall-clock adjustments can't burst through."""

    def __init__(self, rate: float, clock=time.monotonic, sleep=time.sleep):
        self.min_interval = 1.0 / rate if rate > 0 else 0.0
        self._clock = clock
        self._sleep = sleep
        self._next_ok = clock()

    def acquire(self) -> float:
        """Block until a request is allowed; returns seconds slept."""
        now = self._clock()
        wait = self._next_ok - now
        if wait > 0:
            self._sleep(wait)
            now = self._next_ok
        self._next_ok = now + self.min_interval
        return max(wait, 0.0)


@dataclass
class _ItemChunk(InputPartition):
    item_ids: Sequence[int]


_TIMESTEP_SECONDS = {"5m": 300, "1h": 3600, "6h": 21600, "24h": 86400}


def _parse_common_options(options: dict) -> dict:
    """Shared option parsing for the batch and stream readers (one
    place for defaults and the user-agent rule — they must not
    diverge)."""
    items = [
        int(x) for x in str(options.get("items", "")).split(",") if x.strip()
    ]
    if not items:
        raise ValueError(
            "rest_timeseries: 'items' option (comma-separated ids) is required"
        )
    out = {
        "items": items,
        "timestep": options.get("timestep", "24h"),
        "rate": float(options.get("rate_limit_rps", 2.0)),
        "base_url": options.get(
            "base_url", "https://prices.runescape.wiki/api/v1/osrs/timeseries"
        ),
        "user_agent": options.get("user_agent", ""),
        "transport_spec": options.get(
            "transport", "osrs_dashboard_elt_spark.sources.rest:fake_transport"
        ),
    }
    if out["transport_spec"].endswith(":requests_transport") and not out[
        "user_agent"
    ]:
        # the wiki API requires a descriptive User-Agent (reference
        # 4_fetch_item_prices.py:59-61) — fail at plan time, not after
        # N tasks have hit the API anonymously
        raise ValueError(
            "rest_timeseries: 'user_agent' is required for the real transport"
        )
    return out


class RestTimeSeriesReader(DataSourceReader):
    def __init__(self, options: dict):
        common = _parse_common_options(options)
        self.items = common["items"]
        self.chunk = int(options.get("items_per_partition", 50))
        self.timestep = common["timestep"]
        self.n_points = int(options.get("n_points", 30))
        self.rate = common["rate"]
        self.base_url = common["base_url"]
        self.user_agent = common["user_agent"]
        self.transport_spec = common["transport_spec"]

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _ItemChunk(self.items[i : i + self.chunk])
            for i in range(0, len(self.items), self.chunk)
        ]

    def read(self, partition: _ItemChunk) -> Iterator[tuple]:
        transport = _resolve_transport(self.transport_spec)
        bucket = TokenBucket(self.rate)
        headers = {"User-Agent": self.user_agent} if self.user_agent else {}
        for item_id in partition.item_ids:
            bucket.acquire()
            url = (
                f"{self.base_url}?timestep={self.timestep}&id={item_id}"
                f"&n={self.n_points}"
            )
            for row in transport(url, headers):
                yield (
                    item_id,
                    int(row["timestamp"]),
                    row.get("avgHighPrice"),
                    row.get("avgLowPrice"),
                    row.get("highPriceVolume"),
                    row.get("lowPriceVolume"),
                )


class RestTimeSeriesStreamReader(SimpleDataSourceStreamReader):
    """The reference polls the API from cron (run_all_etl.py);
    Spark-natively that is a STREAM: each micro-batch fetches the next
    ``points_per_batch`` samples per item through the SAME injected
    transport as the batch reader, the offset is the sample index, and
    replay between committed offsets re-GETs the identical
    ``from=``-paged window (exact for the pure-function fake; the real
    API's 5m/1h endpoints honor ``from`` the same way).
    Watermarks/dedup downstream come from the existing streaming
    ingest operators."""

    def __init__(self, options: dict):
        common = _parse_common_options(options)
        self.items = common["items"]
        self.points_per_batch = int(options.get("points_per_batch", 5))
        self.max_points = int(options.get("max_points", 30))
        self.timestep = common["timestep"]
        self.rate = common["rate"]
        self.base_url = common["base_url"]
        self.user_agent = common["user_agent"]
        self.transport_spec = common["transport_spec"]
        # from=-window stride derives from the CONFIGURED timestep —
        # a hardcoded daily stride against a 5m/1h series would page
        # overlapping/gapped windows.  epoch0 anchors the series; the
        # default matches the deterministic fake transport so existing
        # offsets stay valid, and a real deployment passes its own.
        if self.timestep not in _TIMESTEP_SECONDS:
            raise ValueError(
                f"rest_timeseries: unknown timestep {self.timestep!r}; "
                f"expected one of {sorted(_TIMESTEP_SECONDS)}"
            )
        self.step_seconds = int(
            options.get("step_seconds", _TIMESTEP_SECONDS[self.timestep])
        )
        self.epoch0 = int(options.get("epoch0", FAKE_EPOCH0))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        if hi <= lo:
            return []
        transport = _resolve_transport(self.transport_spec)
        bucket = TokenBucket(self.rate)
        headers = {"User-Agent": self.user_agent} if self.user_agent else {}
        out = []
        for item_id in self.items:
            bucket.acquire()
            url = (
                f"{self.base_url}?timestep={self.timestep}&id={item_id}"
                f"&from={self.epoch0 + lo * self.step_seconds}&n={hi - lo}"
            )
            for row in transport(url, headers):
                out.append(
                    (
                        item_id,
                        int(row["timestamp"]),
                        row.get("avgHighPrice"),
                        row.get("avgLowPrice"),
                        row.get("highPriceVolume"),
                        row.get("lowPriceVolume"),
                    )
                )
        return out

    def read(self, start: dict):
        lo = start["i"]
        hi = min(lo + self.points_per_batch, self.max_points)
        return iter(self._rows(lo, hi)), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["i"], end["i"]))


class RestTimeSeriesDataSource(DataSource):
    """``spark.read.format("rest_timeseries")`` (batch) or
    ``spark.readStream.format("rest_timeseries")`` (micro-batch
    poller) after ``spark.dataSource.register(RestTimeSeriesDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "rest_timeseries"

    def schema(self) -> StructType:
        return PRICE_SCHEMA

    def reader(self, schema: StructType) -> RestTimeSeriesReader:
        return RestTimeSeriesReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> RestTimeSeriesStreamReader:
        return RestTimeSeriesStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering replaces)."""
    spark.dataSource.register(RestTimeSeriesDataSource)


# ---------------------------------------------------------------------------
# S8: cached item-mapping dimension (fetch /mapping, parquet cache,
# force-refresh on miss) — reference 4_fetch_item_prices.py:17-52
# ---------------------------------------------------------------------------

MAPPING_SCHEMA = StructType(
    [
        StructField("item_id", IntegerType(), False),
        StructField("item_name", StringType(), True),
    ]
)


def fake_mapping_transport(url: str, headers: dict[str, str]) -> list[dict]:
    """Deterministic /mapping stand-in: 100 items, names derived from
    the id."""
    return [{"id": i, "name": f"Item {i}"} for i in range(100)]


def cached_item_mapping(
    spark,
    cache_path: str,
    transport: str = "osrs_dashboard_elt_spark.sources.rest:fake_mapping_transport",
    user_agent: str = "",
    required_ids: Sequence[int] | None = None,
    force_refresh: bool = False,
) -> "DataFrame":
    """The id→name dimension with the reference's cache discipline:

    - serve the parquet cache when present (broadcast-sized — callers
      join it with ``F.broadcast``);
    - fetch via the injected transport and (re)write the cache when
      missing, unreadable, or ``force_refresh``;
    - ``required_ids``: the reference forces an update when a
      configured item is absent from the cache — same rule here, one
      tiny ``isin``+count probe against the cached dimension.

    The fetch itself is DRIVER-side (one request, one small payload),
    exactly like the reference; only the resulting dimension is a
    DataFrame.  Returns the mapping DataFrame."""
    from pyspark.sql import DataFrame  # local: avoid module import cycle

    def _read_cache():
        try:
            df = spark.read.schema(MAPPING_SCHEMA).parquet(cache_path)
            df.first()  # force a read so corrupt caches fail HERE
            return df
        except Exception:
            return None

    cached = None if force_refresh else _read_cache()
    if cached is not None and required_ids:
        ids = list(dict.fromkeys(int(i) for i in required_ids))
        # countDistinct, not count: a duplicated cached row for one
        # required id must not mask another id's absence.
        from pyspark.sql import functions as F

        found = (
            cached.filter(cached.item_id.isin(ids))
            .select(F.countDistinct("item_id").alias("n"))
            .collect()[0]["n"]
        )
        if found < len(ids):
            cached = None  # miss -> force refresh, reference rule
    if cached is not None:
        return cached

    fn = _resolve_transport(transport)
    headers = {"User-Agent": user_agent} if user_agent else {}
    rows = [
        (int(item["id"]), item.get("name"))
        for item in fn("https://prices.runescape.wiki/api/v1/osrs/mapping", headers)
    ]
    df = spark.createDataFrame(rows, MAPPING_SCHEMA)
    df.write.mode("overwrite").parquet(cache_path)
    return spark.read.schema(MAPPING_SCHEMA).parquet(cache_path)
