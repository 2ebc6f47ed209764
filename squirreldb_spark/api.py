"""Prometheus-compatible query API surface (SURVEY §2 "Set/DDL API operators").

The reference exposes ``/api/v1/query``, ``/query_range``, ``/series``,
``/labels``, ``/label/<name>/values`` plus remote read/write over HTTP
(reference api/api.go:209-341), with per-request headers driving tenancy,
forced matchers, limits and raw/pre-agg routing
(api/promql/queryable.go:122-249, types/types.go:171-195).

Here the same surface is a driver-side façade over the PromQL engine:
each endpooint builds ONE DataFrame program; HTTP/JSON serialization is a
thin shell around :meth:`PromAPI.query_range` etc. (any WSGI server can
wrap this — the engine itself stays transport-agnostic). The per-request
chain the reference implements as wrapper indexes/readers
(filtering_index -> limiting_index -> caching_reader) collapses to plain
DataFrame filters prepended to every selector:

* tenant / forced matcher (A27)  -> ``points.filter(tenant == X)`` up front
* series limit (A25)             -> count guard on the matched series dim
* points limit (A26)             -> count guard on the scanned fact slice
* time clamp (A28)               -> ``greatest/least`` on the request bounds

Remote write protobuf/snappy codecs are not reimplemented: ingestion is the
Structured Streaming path (``streaming.ingest``); see
:func:`decode_remote_write` for the gated stub.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from squirreldb_spark.promql.planner import PromQLEngine

# reference api/promql/time_range_index.go:29-87: clamp query times into
# [epoch, year 3000]
MIN_TS_MS = 0
MAX_TS_MS = 32_503_680_000_000


class LimitExceeded(Exception):
    """A24/A25-style guard tripped (max_evaluated_series / points)."""


class QueryTimeout(Exception):
    """Per-query wall-clock deadline exceeded (the reference engine's
    Timeout=2 min, api/promql/engine.go:39-40)."""


def run_with_timeout(spark, fn, timeout_ms: int | None, desc: str = "promql"):
    """Run ``fn`` (a driver-side materialization) under a wall-clock
    deadline, killing its Spark jobs on expiry.

    The work is tagged with a per-call job group (``interruptOnCancel``
    so running tasks are interrupted, the analogue of the reference's
    context cancellation); a watchdog thread cancels the group at the
    deadline and keeps re-cancelling until ``fn`` returns, so jobs
    submitted after the first cancel don't slip through. Like upstream's
    context deadline, expiry raises :class:`QueryTimeout` even if a
    result arrived late.
    """
    if not timeout_ms:
        return fn()
    import threading
    import uuid

    sc = spark.sparkContext
    gid = f"sq-query-{uuid.uuid4().hex}"
    done = threading.Event()
    expired = threading.Event()

    def watchdog():
        if done.wait(timeout_ms / 1000.0):
            return
        expired.set()
        while not done.is_set():
            try:
                sc.cancelJobGroup(gid)
            except Exception:  # pragma: no cover - JVM teardown race
                pass
            done.wait(0.05)

    sc.setJobGroup(gid, desc, interruptOnCancel=True)
    t = threading.Thread(target=watchdog, daemon=True)
    t.start()
    try:
        result = fn()
    except Exception:
        if expired.is_set():
            raise QueryTimeout(
                f"query execution exceeded {timeout_ms} ms"
            ) from None
        raise
    finally:
        done.set()
        try:
            sc.setLocalProperty("spark.jobGroup.id", None)
        except Exception:  # pragma: no cover
            pass
    if expired.is_set():
        raise QueryTimeout(f"query execution exceeded {timeout_ms} ms")
    return result


@dataclass
class RequestOptions:
    """Per-request knobs, the reference's HTTP headers (types/types.go:171-195)."""

    tenant: str | None = None             # X-SquirrelDB-Tenant
    forced_matchers: dict[str, str] = field(default_factory=dict)  # X-...-Forced-Matcher
    max_evaluated_series: int | None = None
    max_evaluated_points: int | None = None
    force_raw: bool = False               # X-SquirrelDB-ForceRaw
    force_pre_aggregated: bool = False    # X-SquirrelDB-ForcePreAggregated


def clamp_time(ts_ms: int) -> int:
    return max(MIN_TS_MS, min(MAX_TS_MS, ts_ms))


class PromAPI:
    """The /api/v1 endpoint set over a points DataFrame.

    ``points`` columns: ``(*label_cols, ts, value)`` (+ optional ``tenant``).
    """

    def __init__(
        self,
        points: DataFrame,
        label_cols: tuple[str, ...] = ("user_id", "event_type"),
        name_label: str = "event_type",
        lookback_ms: int = 300_000,
        tenant_col: str = "tenant",
        mutable_mapping: DataFrame | None = None,
        downsample: DataFrame | None = None,
        preagg_resolution_ms: int = 300_000,
        preagg_until_ms: int | None = None,
        labels_map_col: str | None = None,
        max_samples: int | None = None,
    ):
        self.points = points
        self.label_cols = tuple(label_cols)
        self.name_label = name_label
        self.lookback_ms = lookback_ms
        self.tenant_col = tenant_col
        self.mutable_mapping = mutable_mapping
        # A15-A17: optional pre-aggregate table + the raw/pre-agg routing
        # cutoff, handed through to every engine the endpoints build
        self.downsample = downsample
        self.preagg_resolution_ms = preagg_resolution_ms
        self.preagg_until_ms = preagg_until_ms
        # dynamic label model: per-series label sets in a map column
        # (promql.planner promotes referenced names per query)
        self.labels_map_col = labels_map_col
        #: always-on total-sample budget (the reference engine's
        #: MaxSamples=50M, api/promql/engine.go:39-41); None = unlimited
        self.max_samples = max_samples

    # ------------------------------------------------------------ internals

    def _scoped(self, opts: RequestOptions | None,
                df: DataFrame | None = None) -> DataFrame:
        """Apply the implicit per-request matchers (tenant + forced)."""
        pts = self.points if df is None else df
        if opts is None:
            return pts
        if opts.tenant is not None:
            if self.tenant_col in pts.columns:
                pts = pts.filter(F.col(self.tenant_col) == opts.tenant)
            elif self.labels_map_col is not None:
                # dynamic-label store: the tenant is a label inside the
                # map (the reference injects __account_id at write,
                # api/remotestorage/write.go:80-170)
                pts = pts.filter(
                    F.element_at(
                        F.col(self.labels_map_col), F.lit(self.tenant_col)
                    )
                    == opts.tenant
                )
            else:
                raise ValueError("points have no tenant column")
        for name, value in opts.forced_matchers.items():
            if name in pts.columns:
                pts = pts.filter(F.col(name).cast("string") == value)
            elif self.labels_map_col is not None:
                pts = pts.filter(
                    F.element_at(F.col(self.labels_map_col), F.lit(name))
                    == value
                )
            else:
                raise ValueError(f"unknown forced matcher label {name!r}")
        return pts

    def _guard(self, pts: DataFrame, start_ms: int, end_ms: int,
               opts: RequestOptions | None,
               promql: str | None = None) -> None:
        """A25/A26 series/points limits plus the engine sample budget
        (``max_samples``) on the query's fact slice — one scanned-rows
        count over the pruned scan, only when a guard is configured.

        When the query string is known, the counted slice is the AST's
        OWN sample window (planner.time_window) — a ``rate(m[30d])``
        scans 30 days, and the budget must see those rows, not just the
        default lookback slice.
        """
        max_points = opts.max_evaluated_points if opts else None
        max_series = opts.max_evaluated_series if opts else None
        if max_points is None and max_series is None and self.max_samples is None:
            return
        behind, ahead = self.lookback_ms, 0
        if promql is not None:
            from squirreldb_spark.promql.parser import parse
            from squirreldb_spark.promql.planner import time_window

            try:
                behind, ahead, anchors = time_window(
                    parse(promql), self.lookback_ms
                )
                # An @-anchored selector reads its whole window around
                # the anchor, not around [start,end] — widen by the
                # expression's OWN pre-anchor window (behind/ahead as
                # computed above), so e.g. rate(m[30d] @ t) with t
                # outside the query range still budgets the 30d it scans.
                behind_expr, ahead_expr = behind, ahead
                for a in anchors:
                    behind = max(behind, start_ms - (a - behind_expr))
                    ahead = max(ahead, (a + ahead_expr) - end_ms)
            except Exception:
                # unparseable here -> engine raises the real error later;
                # guard conservatively on the default slice
                behind, ahead = self.lookback_ms, 0
        sl = pts.filter(
            (F.col("ts") > start_ms - behind) & (F.col("ts") <= end_ms + ahead)
        )
        if max_points is not None or self.max_samples is not None:
            n = sl.count()
            if self.max_samples is not None and n > self.max_samples:
                raise LimitExceeded(
                    f"{n} samples > engine budget max_samples={self.max_samples}"
                )
            if max_points is not None and n > max_points:
                raise LimitExceeded(
                    f"{n} points > max_evaluated_points={max_points}"
                )
        if opts is not None and opts.max_evaluated_series is not None:
            if self.label_cols:
                ident = sl.select(*self.label_cols)
            elif self.labels_map_col is not None:
                # dynamic-label store: the canonical map IS the identity
                ident = sl.select(
                    F.to_json(
                        F.expr(
                            "map_from_entries(array_sort(map_entries("
                            f"{self.labels_map_col})))"
                        )
                    )
                )
            else:
                ident = sl
            n = ident.distinct().count()
            if n > opts.max_evaluated_series:
                raise LimitExceeded(
                    f"{n} series > max_evaluated_series={opts.max_evaluated_series}"
                )

    def _engine(self, start_ms: int, end_ms: int, step_ms: int,
                opts: RequestOptions | None,
                promql: str | None = None) -> PromQLEngine:
        start_ms, end_ms = clamp_time(start_ms), clamp_time(end_ms)
        pts = self._scoped(opts)
        self._guard(pts, start_ms, end_ms, opts, promql=promql)
        ds = self.downsample
        if ds is not None:
            ds = self._scoped(opts, ds)
        return PromQLEngine(
            pts, label_cols=self.label_cols, name_label=self.name_label,
            step_ms=step_ms, lookback_ms=self.lookback_ms,
            start_ms=start_ms, end_ms=end_ms,
            mutable_mapping=self.mutable_mapping,
            tenant=(opts.tenant if opts and opts.tenant else ""),
            downsample=ds,
            preagg_resolution_ms=self.preagg_resolution_ms,
            preagg_until_ms=self.preagg_until_ms,
            force_raw=bool(opts and opts.force_raw),
            force_preagg=bool(opts and opts.force_pre_aggregated),
            labels_map_col=self.labels_map_col,
        )

    # ------------------------------------------------------------ endpoints

    def query_range(self, promql: str, start_ms: int, end_ms: int, step_ms: int,
                    opts: RequestOptions | None = None,
                    enrich_mutable: str | None = None) -> DataFrame:
        """/api/v1/query_range -> (labels..., step_ts, value).

        ``enrich_mutable`` (A32): attach the named mutable label to result
        series via a broadcast join against the mapping.
        """
        out = self._engine(
            start_ms, end_ms, step_ms, opts, promql=promql
        ).query_range(promql)
        if enrich_mutable is not None:
            from squirreldb_spark.tsdb import mutable as mut

            if self.mutable_mapping is None:
                raise ValueError("no mutable mapping configured")
            out = mut.enrich(
                out, self.mutable_mapping,
                opts.tenant if opts and opts.tenant else "", enrich_mutable,
            )
        return out

    def query(self, promql: str, time_ms: int,
              opts: RequestOptions | None = None) -> DataFrame:
        """/api/v1/query (instant): a range query with a single step."""
        return self.query_range(promql, time_ms, time_ms, 1, opts)

    def series(self, matchers: str, start_ms: int, end_ms: int,
               opts: RequestOptions | None = None) -> DataFrame:
        """/api/v1/series: the distinct label sets active in [start, end].

        ``matchers`` is a PromQL selector string (``{job="api"}``). Mirrors
        the reference's early-exit "series" scan (tsdb/read.go:392-396):
        Catalyst stops at the distinct of the pruned slice — no values read.
        """
        eng = PromQLEngine(
            self._scoped(opts), label_cols=self.label_cols,
            name_label=self.name_label, step_ms=1, lookback_ms=self.lookback_ms,
            start_ms=0, end_ms=0, labels_map_col=self.labels_map_col,
            # same mutable/tenant wiring as query_range — a mutable-label
            # matcher must resolve identically on /series
            mutable_mapping=self.mutable_mapping,
            tenant=(opts.tenant if opts and opts.tenant else ""),
        )
        from squirreldb_spark.promql.parser import parse

        sel = parse(matchers)
        eng = eng._with_dynamic_labels(sel)
        pts = eng._select_points(sel).filter(
            (F.col("ts") >= clamp_time(start_ms)) & (F.col("ts") <= clamp_time(end_ms))
        )
        if self.labels_map_col is not None:
            # dynamic labels: the canonical sorted-JSON label set IS the
            # series identity
            return pts.select(F.col("__series__").alias("series")).distinct()
        return pts.select(*self.label_cols).distinct()

    def labels(self, opts: RequestOptions | None = None) -> list[str]:
        """/api/v1/labels — fixed-schema label columns (+ __name__); with
        a dynamic map column, also every label NAME present in the data
        (the reference's label-names index scan, index.go:1903-2136)."""
        names = set(self.label_cols) | {"__name__"}
        if self.labels_map_col is not None:
            rows = (
                self._scoped(opts)
                .select(
                    F.explode(F.map_keys(F.col(self.labels_map_col))).alias("k")
                )
                .distinct()
                .collect()
            )
            names |= {r.k for r in rows}
        return sorted(names)

    def label_values(self, name: str,
                     opts: RequestOptions | None = None) -> DataFrame:
        """/api/v1/label/<name>/values."""
        col = self.name_label if name == "__name__" else name
        if col in self.label_cols:
            expr = F.col(col).cast("string")
        elif self.labels_map_col is not None:
            expr = F.element_at(F.col(self.labels_map_col), F.lit(col))
        else:
            raise ValueError(f"unknown label {name!r}")
        return (
            self._scoped(opts)
            .select(expr.alias("value"))
            .filter(F.col("value").isNotNull())
            .distinct()
            .orderBy("value")
        )

    # ----------------------------------------------------------- remote read

    def _read_query_slice(self, q) -> DataFrame:
        """A remote-read Query as a ``(_lbl, ts, value)`` DataFrame: the
        matchers become plain scan filters (the same pushed-filter path
        every selector uses) and ``_lbl`` is the canonical sorted-JSON
        label set."""
        pts = self.points
        for op, name, value in q.matchers:
            col_name = self.name_label if name == "__name__" else name
            if col_name in pts.columns:
                col = F.col(col_name).cast("string")
            elif self.labels_map_col is not None:
                # dynamic-label store: match against the map entry
                # (missing key compares as "", upstream semantics)
                col = F.coalesce(
                    F.element_at(
                        F.col(self.labels_map_col), F.lit(name)
                    ),
                    F.lit(""),
                )
            else:
                raise ValueError(f"unknown label {name!r}")
            if op == "=":
                pts = pts.filter(col == value)
            elif op == "!=":
                pts = pts.filter(col != value)
            elif op == "=~":
                pts = pts.filter(col.rlike(f"^(?:{value})$"))
            else:
                pts = pts.filter(~col.rlike(f"^(?:{value})$"))
        pts = pts.filter(
            (F.col("ts") >= clamp_time(q.start_timestamp_ms))
            & (F.col("ts") <= clamp_time(q.end_timestamp_ms))
        )
        if self.labels_map_col is not None and not self.label_cols:
            return pts.select(
                F.to_json(
                    F.expr(
                        "map_from_entries(array_sort(map_entries("
                        f"{self.labels_map_col})))"
                    )
                ).alias("_lbl"),
                "ts", "value",
            )
        return pts.select(
            F.to_json(
                F.struct(
                    *[
                        F.col(c).cast("string").alias(c)
                        for c in self.label_cols
                    ]
                )
            ).alias("_lbl"),
            "ts", "value",
        )

    def remote_read(self, body: bytes, limit: int = 100_000, *,
                    decompressed: bool = False) -> bytes:
        """/api/v1/read SAMPLES response: snappy+prompb ReadRequest in,
        one ReadResponse out (reference api/api.go:58-61; A33/A34).

        ``limit`` bounds the rows collected per query — the non-streamed
        response is a driver-side materialization by construction; large
        reads should negotiate STREAMED_XOR_CHUNKS
        (:meth:`remote_read_frames`) instead. ``decompressed=True`` means
        ``body`` is the raw protobuf (the HTTP layer already paid the
        snappy decode for response-type negotiation — don't pay it twice).
        """
        from squirreldb_spark import codec

        buf = body if decompressed else codec.snappy_decompress(body)
        results: list[list[codec.TimeSeries]] = []
        for q in codec.decode_read_request(buf):
            rows = (
                self._read_query_slice(q).orderBy("_lbl", "ts")
                .limit(limit).collect()
            )
            import json as _json

            by_series: dict[str, codec.TimeSeries] = {}
            for r in rows:
                ts = by_series.get(r["_lbl"])
                if ts is None:
                    ts = by_series[r["_lbl"]] = codec.TimeSeries(
                        labels=_json.loads(r["_lbl"])
                    )
                ts.samples.append(codec.Sample(r["value"], r["ts"]))
            results.append(list(by_series.values()))
        return codec.encode_remote_read_response_body(results)

    def remote_read_frames(
        self,
        body: bytes,
        frame_bytes: int = 1 << 20,
        samples_per_chunk: int = 120,
        *,
        decompressed: bool = False,
    ):
        """/api/v1/read STREAMED_XOR_CHUNKS response: yields framed
        ``ChunkedReadResponse`` messages, each at most ~``frame_bytes``
        (the reference's 1 MiB ChunkedReadLimit, api/api.go:58-61;
        chunk streaming in api/promql/queryable.go:436-445).

        Driver memory is bounded by ONE frame: rows stream through
        ``toLocalIterator`` over the ts-sorted per-series slices (one
        partition resident at a time), samples cut into XOR chunks of
        ``samples_per_chunk`` (upstream's 120), and a frame flushes as
        soon as it exceeds the budget — no per-query row limit needed.
        """
        import json as _json

        from squirreldb_spark import codec

        buf = body if decompressed else codec.snappy_decompress(body)
        for qi, q in enumerate(codec.decode_read_request(buf)):
            it = (
                self._read_query_slice(q).orderBy("_lbl", "ts")
                .toLocalIterator()
            )
            frame: list[codec.ChunkedSeries] = []
            frame_size = 0
            cur_lbl: str | None = None
            cur_samples: list[codec.Sample] = []

            def flush_chunk():
                nonlocal frame_size
                if not cur_samples:
                    return
                data = codec.encode_xor_chunk(cur_samples)
                chunk = (
                    cur_samples[0].timestamp_ms,
                    cur_samples[-1].timestamp_ms,
                    codec.XOR_ENCODING,
                    data,
                )
                if frame and frame[-1].labels == _json.loads(cur_lbl):
                    frame[-1].chunks.append(chunk)
                else:
                    frame.append(codec.ChunkedSeries(
                        labels=_json.loads(cur_lbl), chunks=[chunk]
                    ))
                frame_size += len(data) + len(cur_lbl) + 16
                cur_samples.clear()

            for r in it:
                if cur_lbl is not None and (
                    r["_lbl"] != cur_lbl
                    or len(cur_samples) >= samples_per_chunk
                ):
                    flush_chunk()
                    if frame_size >= frame_bytes:
                        yield codec.frame_chunked_message(
                            codec.encode_chunked_read_response(frame, qi)
                        )
                        frame, frame_size = [], 0
                cur_lbl = r["_lbl"]
                cur_samples.append(codec.Sample(r["value"], r["ts"]))
            flush_chunk()
            if frame:
                yield codec.frame_chunked_message(
                    codec.encode_chunked_read_response(frame, qi)
                )

    # --------------------------------------------------------- serialization

    def format_vector(self, df: DataFrame, limit: int = 10_000) -> dict:
        """Render an instant-query result as the Prometheus JSON body
        (``resultType: vector`` — one sample per series)."""
        rows = df.limit(limit).collect()
        label_names = [c for c in df.columns if c not in ("step_ts", "value")]
        result = [
            {
                "metric": {l: str(r[l]) for l in label_names},
                "value": [r["step_ts"] / 1000.0, str(r["value"])],
            }
            for r in rows
        ]
        return {
            "status": "success",
            "data": {"resultType": "vector", "result": result},
        }

    def format_matrix(self, df: DataFrame, limit: int = 10_000) -> dict:
        """Render a query_range result as the Prometheus JSON body.

        Driver-side by construction (an API response IS a collect); ``limit``
        bounds the rows pulled to the driver.
        """
        rows = df.limit(limit).collect()
        series: dict[tuple, dict] = {}
        label_names = [c for c in df.columns if c not in ("step_ts", "value")]
        for r in rows:
            key = tuple(str(r[l]) for l in label_names)
            entry = series.setdefault(
                key,
                {"metric": dict(zip(label_names, key)), "values": []},
            )
            entry["values"].append([r["step_ts"] / 1000.0, str(r["value"])])
        for entry in series.values():
            entry["values"].sort(key=lambda v: v[0])
        return {
            "status": "success",
            "data": {"resultType": "matrix", "result": list(series.values())},
        }


def decode_remote_write(body: bytes, spark=None) -> DataFrame | list:
    """Prometheus remote-write decode (reference A1,
    api/remotestorage/write.go:80-170): snappy block body -> prompb
    WriteRequest, via the dependency-free wire codec in
    :mod:`squirreldb_spark.codec`.

    With ``spark``, returns a tall DataFrame
    ``(labels MAP<STRING,STRING>, ts BIGINT, value DOUBLE)`` ready for
    the streaming ingest path; without it, the decoded
    ``codec.TimeSeries`` list.
    """
    from squirreldb_spark import codec

    series = codec.decode_remote_write_body(body)
    if spark is None:
        return series
    rows = [
        (ts.labels, s.timestamp_ms, s.value)
        for ts in series
        for s in ts.samples
    ]
    return spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double"
    )
