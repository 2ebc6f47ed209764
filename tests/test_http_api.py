"""End-to-end HTTP daemon tests (reference api/api.go:209-341).

A real socket is bound; the client is urllib. The write path POSTs a
snappy-compressed prompb WriteRequest exactly like a Prometheus
remote_write client, then reads the same samples back through
/api/v1/query_range, /api/v1/query, /api/v1/read, /labels,
/label/<name>/values and /series.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

import pytest

from squirreldb_spark import codec
from squirreldb_spark.http_api import PromHTTPServer


def _post(url: str, body: bytes, headers: dict | None = None) -> tuple[int, bytes]:
    req = urllib.request.Request(url, data=body, method="POST")
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as ex:
        return ex.code, ex.read()


def _get(url: str, headers: dict | None = None) -> tuple[int, dict]:
    req = urllib.request.Request(url)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as ex:
        return ex.code, json.loads(ex.read())


@pytest.fixture(scope="module")
def server(spark):
    srv = PromHTTPServer(spark, lookback_ms=300_000).start()
    yield srv
    srv.stop()


@pytest.fixture(scope="module")
def base(server):
    return f"http://127.0.0.1:{server.port}"


@pytest.fixture(scope="module")
def written(server, base):
    """POST a WriteRequest: 2 series x 3 samples, one tenant-scoped."""
    series = [
        codec.TimeSeries(
            labels={"__name__": "http_requests_total", "job": "api", "inst": "a"},
            samples=[codec.Sample(1.0, 10_000), codec.Sample(4.0, 70_000),
                     codec.Sample(9.0, 130_000)],
        ),
        codec.TimeSeries(
            labels={"__name__": "http_requests_total", "job": "api", "inst": "b"},
            samples=[codec.Sample(2.0, 10_000), codec.Sample(3.0, 70_000),
                     codec.Sample(5.0, 130_000)],
        ),
    ]
    body = codec.encode_remote_write_body(series)
    status, _ = _post(
        f"{base}/api/v1/write", body,
        {"X-SquirrelDB-Tenant": "t0", "X-SquirrelDB-TTL": "86400",
         "Content-Encoding": "snappy",
         "Content-Type": "application/x-protobuf"},
    )
    assert status == 204
    return series


def test_write_then_query_range_roundtrip(base, written):
    status, out = _get(
        f"{base}/api/v1/query_range?query=http_requests_total"
        "&start=0&end=130&step=60",
        {"X-SquirrelDB-Tenant": "t0"},
    )
    assert status == 200 and out["status"] == "success"
    assert out["data"]["resultType"] == "matrix"
    result = out["data"]["result"]
    by_inst = {e["metric"]["inst"]: e for e in result}
    assert set(by_inst) == {"a", "b"}
    assert by_inst["a"]["metric"]["__name__"] == "http_requests_total"
    assert by_inst["a"]["metric"]["job"] == "api"
    # step 60s grid at 60/120s sees samples 4.0 (ts=70s? no: lookback):
    # at step 60s the freshest sample <= 60s is ts=10s -> 1.0; at 120s
    # it's ts=70s -> 4.0
    vals_a = {int(t): float(v) for t, v in by_inst["a"]["values"]}
    assert vals_a[60] == 1.0 and vals_a[120] == 4.0


def test_tenant_isolation(base, written):
    status, out = _get(
        f"{base}/api/v1/query_range?query=http_requests_total"
        "&start=0&end=130&step=60",
        {"X-SquirrelDB-Tenant": "other"},
    )
    assert status == 200
    assert out["data"]["result"] == []


def test_instant_query_vector(base, written):
    status, out = _get(
        f"{base}/api/v1/query?query=sum(http_requests_total)&time=130",
        {"X-SquirrelDB-Tenant": "t0"},
    )
    assert status == 200
    result = out["data"]["result"]
    assert out["data"]["resultType"] == "vector"
    assert len(result) == 1
    assert float(result[0]["value"][1]) == 14.0  # 9 + 5 at t=130s


def test_rate_drops_name_over_http(base, written):
    status, out = _get(
        f"{base}/api/v1/query?query=rate(http_requests_total%5B2m%5D)&time=130",
        {"X-SquirrelDB-Tenant": "t0"},
    )
    assert status == 200
    for entry in out["data"]["result"]:
        assert "__name__" not in entry["metric"]
        assert entry["metric"]["job"] == "api"


def test_labels_and_label_values(base, written):
    status, out = _get(f"{base}/api/v1/labels")
    assert status == 200
    assert {"__name__", "job", "inst"} <= set(out["data"])
    status, out = _get(f"{base}/api/v1/label/inst/values")
    assert status == 200
    assert out["data"] == ["a", "b"]
    status, out = _get(f"{base}/api/v1/label/__name__/values")
    assert status == 200
    assert out["data"] == ["http_requests_total"]


def test_series_endpoint(base, written):
    status, out = _get(
        f"{base}/api/v1/series?match[]=http_requests_total&start=0&end=200"
    )
    assert status == 200
    insts = {d["inst"] for d in out["data"]}
    assert insts == {"a", "b"}
    assert all(d["__name__"] == "http_requests_total" for d in out["data"])


def test_remote_read_roundtrip(base, written):
    body = codec.encode_read_request(
        [codec.Query(
            start_timestamp_ms=0, end_timestamp_ms=200_000,
            matchers=[("=", "inst", "a")],
        )]
    )
    status, raw = _post(
        f"{base}/api/v1/read", codec.snappy_compress(body),
        {"Content-Encoding": "snappy",
         "Content-Type": "application/x-protobuf"},
    )
    assert status == 200
    results = codec.decode_read_response(codec.snappy_decompress(raw))
    assert len(results) == 1 and len(results[0]) == 1
    ts = results[0][0]
    assert ts.labels["inst"] == "a"
    assert [(s.value, s.timestamp_ms) for s in ts.samples] == [
        (1.0, 10_000), (4.0, 70_000), (9.0, 130_000)
    ]


def test_remote_read_streamed_chunks(spark):
    """Negotiating STREAMED_XOR_CHUNKS returns MULTIPLE framed
    ChunkedReadResponse messages (uvarint + crc32c framing, XOR-encoded
    chunk payloads) with bounded server memory — the reference's
    streamed read path (api/api.go:58-61 ChunkedReadLimit). A tiny
    frame budget forces one frame per series."""
    srv = PromHTTPServer(
        spark, lookback_ms=300_000, read_frame_bytes=16
    ).start()
    try:
        base2 = f"http://127.0.0.1:{srv.port}"
        series = [
            codec.TimeSeries(
                labels={"__name__": "stream_metric", "inst": f"i{j}"},
                samples=[
                    codec.Sample(float(j * 100 + k), 1_000 * k)
                    for k in range(10)
                ],
            )
            for j in range(3)
        ]
        status, _ = _post(
            f"{base2}/api/v1/write",
            codec.encode_remote_write_body(series),
            {"Content-Encoding": "snappy",
             "Content-Type": "application/x-protobuf"},
        )
        assert status == 204
        body = codec.encode_read_request(
            [codec.Query(
                start_timestamp_ms=0, end_timestamp_ms=1_000_000,
                matchers=[("=", "__name__", "stream_metric")],
            )],
            accepted_response_types=[codec.READ_STREAMED_XOR_CHUNKS],
        )
        req = urllib.request.Request(
            f"{base2}/api/v1/read",
            data=codec.snappy_compress(body), method="POST",
            headers={"Content-Encoding": "snappy",
                     "Content-Type": "application/x-protobuf"},
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.status == 200
            assert resp.headers["Content-Type"].startswith(
                "application/x-streamed-protobuf"
            )
            # the stream is NOT snappy-compressed (chunks already are)
            assert resp.headers.get("Content-Encoding") is None
            raw = resp.read()
        frames = list(codec.iter_chunked_frames(raw))
        assert len(frames) >= 3, "expected one frame per series"
        got: dict[str, list] = {}
        for fr in frames:
            chunked, qi = codec.decode_chunked_read_response(fr)
            assert qi == 0
            for cs in chunked:
                assert cs.labels["__name__"] == "stream_metric"
                for mn, mx, enc, data in cs.chunks:
                    assert enc == codec.XOR_ENCODING
                    smp = codec.decode_xor_chunk(data)
                    assert mn == smp[0].timestamp_ms
                    assert mx == smp[-1].timestamp_ms
                    got.setdefault(cs.labels["inst"], []).extend(
                        (s.value, s.timestamp_ms) for s in smp
                    )
        assert got == {
            f"i{j}": [(float(j * 100 + k), 1_000 * k) for k in range(10)]
            for j in range(3)
        }
    finally:
        srv.stop()


def test_forced_matcher_header(base, written):
    status, out = _get(
        f"{base}/api/v1/query?query=http_requests_total&time=130",
        {"X-SquirrelDB-Tenant": "t0",
         "X-SquirrelDB-Forced-Matcher": "inst=a"},
    )
    assert status == 200
    metrics = [e["metric"] for e in out["data"]["result"]]
    assert len(metrics) == 1 and metrics[0]["inst"] == "a"


def test_query_timeout_returns_prometheus_error_shape(spark):
    """A pathological query is killed at the engine deadline and the
    client sees the upstream error shape (503, errorType "timeout") —
    the reference engine's Timeout=2 min (api/promql/engine.go:39-40).
    query_timeout_ms=1 guarantees expiry before any Spark job finishes."""
    srv = PromHTTPServer(spark, lookback_ms=300_000, query_timeout_ms=1).start()
    try:
        b = f"http://127.0.0.1:{srv.port}"
        series = [codec.TimeSeries(
            labels={"__name__": "m"},
            samples=[codec.Sample(1.0, 10_000)],
        )]
        status, _ = _post(
            f"{b}/api/v1/write", codec.encode_remote_write_body(series),
            {"Content-Encoding": "snappy",
             "Content-Type": "application/x-protobuf"},
        )
        assert status == 204
        # a wide 1s-step subquery: hours of grid x range join if unkilled
        status, out = _get(
            f"{b}/api/v1/query?query=sum_over_time(m%5B360000s%3A1s%5D)&time=130"
        )
        assert status == 503
        assert out["errorType"] == "timeout"
        # the per-request timeout param may SHORTEN but never extend:
        # still 503 even though the client asked for 600s
        status, out = _get(f"{b}/api/v1/query?query=m&time=130&timeout=600")
        assert status == 503 and out["errorType"] == "timeout"
    finally:
        srv.stop()


def test_sample_budget_returns_422(spark):
    """The engine MaxSamples analog (50M upstream) trips with no
    per-request headers at all."""
    srv = PromHTTPServer(spark, lookback_ms=300_000, max_samples=2).start()
    try:
        b = f"http://127.0.0.1:{srv.port}"
        series = [codec.TimeSeries(
            labels={"__name__": "m"},
            samples=[codec.Sample(float(k), 10_000 * k) for k in range(1, 8)],
        )]
        status, _ = _post(
            f"{b}/api/v1/write", codec.encode_remote_write_body(series),
            {"Content-Encoding": "snappy",
             "Content-Type": "application/x-protobuf"},
        )
        assert status == 204
        status, out = _get(f"{b}/api/v1/query_range?query=m&start=0&end=130&step=10")
        assert status == 422
        assert out["errorType"] == "execution"
        assert "max_samples" in out["error"]
    finally:
        srv.stop()


def test_limit_header_yields_422(base, written):
    status, out = _get(
        f"{base}/api/v1/query_range?query=http_requests_total"
        "&start=0&end=130&step=60",
        {"X-SquirrelDB-Tenant": "t0",
         "X-SquirrelDB-Max-Evaluated-Series": "1"},
    )
    assert status == 422
    assert out["errorType"] == "execution"


def test_bad_query_yields_400(base, written):
    status, out = _get(f"{base}/api/v1/query?query=rate(oops&time=100")
    assert status == 400
    assert out["status"] == "error"


def test_unknown_endpoint_404(base):
    status, out = _get(f"{base}/api/v1/nope")
    assert status == 404


# ------------------------------------------------- mutable label management


def test_mutable_label_management_write_then_query(base, written):
    """POST /mutable/names + /mutable/values, then a query with the
    mutable matcher resolves through the rewrite (A31) — and DELETE
    makes the next query fail to resolve it again (cache invalidated)."""
    body = json.dumps(
        [{"tenant": "t0", "name": "group", "associated_name": "inst"}]
    ).encode()
    status, _ = _post(f"{base}/mutable/names", body)
    assert status == 204
    body = json.dumps(
        [{"tenant": "t0", "name": "group", "value": "g1",
          "associated_values": ["a"]}]
    ).encode()
    status, _ = _post(f"{base}/mutable/values", body)
    assert status == 204

    status, out = _get(
        f'{base}/api/v1/query?query=http_requests_total%7Bgroup%3D%22g1%22%7D'
        "&time=130",
        {"X-SquirrelDB-Tenant": "t0"},
    )
    assert status == 200, out
    metrics = [e["metric"] for e in out["data"]["result"]]
    assert len(metrics) == 1 and metrics[0]["inst"] == "a"

    # DELETE the name -> the rewrite no longer applies; "group" falls
    # back to a plain (absent) label, so the matcher returns EMPTY —
    # upstream semantics for a label no series carries
    req = urllib.request.Request(
        f"{base}/mutable/names",
        data=json.dumps([{"tenant": "t0", "name": "group"}]).encode(),
        method="DELETE",
    )
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 204
    status, out = _get(
        f'{base}/api/v1/query?query=http_requests_total%7Bgroup%3D%22g1%22%7D'
        "&time=130",
        {"X-SquirrelDB-Tenant": "t0"},
    )
    assert status == 200
    assert out["data"]["result"] == []


def test_write_v2_then_query_range(base, written):
    """A PRW2 (symbol-table) WriteRequest lands alongside v1 data: POST
    with the spec's proto= Content-Type parameter, read back via
    /api/v1/query_range."""
    series = [
        codec.TimeSeries(
            labels={"__name__": "prw2_metric", "job": "v2"},
            samples=[codec.Sample(11.0, 10_000), codec.Sample(12.0, 70_000)],
        ),
    ]
    body = codec.encode_remote_write_body_v2(series)
    status, _ = _post(
        f"{base}/api/v1/write", body,
        {"X-SquirrelDB-Tenant": "t0",
         "Content-Encoding": "snappy",
         "Content-Type":
             "application/x-protobuf;proto=io.prometheus.write.v2.Request"},
    )
    assert status == 204
    status, out = _get(
        f"{base}/api/v1/query_range?query=prw2_metric"
        "&start=0&end=130&step=60",
        {"X-SquirrelDB-Tenant": "t0"},
    )
    assert status == 200, out
    results = out["data"]["result"]
    assert len(results) == 1
    assert results[0]["metric"]["job"] == "v2"
    assert [v for _, v in results[0]["values"]] == ["11.0", "12.0"]


def test_otlp_write_then_query(base, written):
    """OTLP number points land through /api/v1/otlp/v1/metrics (gzip
    protobuf) and come back through the PromQL surface."""
    import gzip

    series = [
        codec.TimeSeries(
            labels={"__name__": "otlp.cpu.usage", "core": "0"},
            samples=[codec.Sample(0.25, 10_000), codec.Sample(0.75, 70_000)],
        ),
    ]
    body = gzip.compress(
        codec.encode_otlp_metrics(series, resource_attrs={"host": "h9"})
    )
    status, _ = _post(
        f"{base}/api/v1/otlp/v1/metrics", body,
        {"X-SquirrelDB-Tenant": "t0",
         "Content-Encoding": "gzip",
         "Content-Type": "application/x-protobuf"},
    )
    assert status == 200
    status, out = _get(
        f"{base}/api/v1/query_range?query=otlp_cpu_usage"
        "&start=0&end=130&step=60",
        {"X-SquirrelDB-Tenant": "t0"},
    )
    assert status == 200, out
    results = out["data"]["result"]
    assert len(results) == 1
    assert results[0]["metric"]["host"] == "h9"
    assert [v for _, v in results[0]["values"]] == ["0.25", "0.75"]


# ---------------------------------------------------- operational routes


def test_ready_and_metrics(base, written):
    status, out = _get(f"{base}/ready")
    assert status == 200 and out["status"] == "ok"
    req = urllib.request.Request(f"{base}/metrics")
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200
        # plain text body: must NOT claim a compressed encoding
        assert resp.headers.get("Content-Encoding") is None
        text = resp.read().decode()
    assert "squirreldb_ingested_samples_total" in text
    assert "squirreldb_buffered_points" in text
    # exposition-format validity: quoted label values, one # TYPE line
    # per family, every sample line parseable by a Prometheus scraper
    assert 'squirreldb_requests_total{path="/api/v1/write"}' in text
    import re

    sample_re = re.compile(
        r'^[a-zA-Z_:][a-zA-Z0-9_:]*'
        r'(\{[a-zA-Z_][a-zA-Z0-9_]*="(?:[^"\\]|\\.)*"'
        r'(,[a-zA-Z_][a-zA-Z0-9_]*="(?:[^"\\]|\\.)*")*\})? '
        r'-?[0-9.eE+]+$'
    )
    families = []
    for line in text.strip().splitlines():
        if line.startswith("# TYPE "):
            families.append(line.split()[2])
            continue
        assert sample_re.match(line), f"unparseable exposition line: {line!r}"
        # every sample belongs to the most recent TYPE'd family
        assert families and line.startswith(families[-1]), line
    assert len(families) == len(set(families)), "duplicate # TYPE family"


def test_debug_index_info_and_verify(base, written):
    status, out = _get(f"{base}/debug/index_info")
    assert status == 200
    assert out["n_points"] >= 6 and out["n_series"] >= 2
    assert "t0" in out["tenants"]
    status, out = _get(f"{base}/debug/index_verify")
    assert status == 200
    checks = out["checks"]
    assert checks["orphan_fact_series"] == 0
    assert checks["empty_dim_series"] == 0
    assert checks["n_series"] >= 2
    assert checks["n_points"] >= checks["n_series"]


def test_debug_preaggregate_and_flush(base, written):
    status, out = _get(f"{base}/debug/preaggregate?from=0&to=1000")
    assert status == 200 and out["buckets"] >= 1
    status, out = _get(f"{base}/debug/flush")
    assert status == 200 and out["points"] >= 6


def test_debug_mutable_dump(base, written):
    body = json.dumps(
        [{"tenant": "t9", "name": "grp", "value": "g1",
          "associated_values": ["a", "b"]}]
    ).encode()
    # need the name registered first
    _post(f"{base}/mutable/names", json.dumps(
        [{"tenant": "t9", "name": "grp", "associated_name": "inst"}]
    ).encode(), {"Content-Type": "application/json"})
    status, _ = _post(f"{base}/mutable/values", body,
                      {"Content-Type": "application/json"})
    assert status == 204
    status, out = _get(f"{base}/debug/mutable_dump")
    assert status == 200
    entries = [e for e in out["data"] if e["tenant"] == "t9"]
    assert entries and entries[0]["associated_values"] == ["a", "b"]


def _get_raw(url: str) -> tuple[int, bytes]:
    try:
        with urllib.request.urlopen(url) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as ex:
        return ex.code, ex.read()


def test_debug_help_lists_endpoints(base, written):
    status, body = _get_raw(f"{base}/debug/")
    assert status == 200
    text = body.decode()
    for ep in ("/debug/index_dump", "/debug/mutable_import",
               "/debug/toggle_debug_query"):
        assert ep in text


def test_debug_index_dump_full_and_by_labels(base, written):
    status, body = _get_raw(f"{base}/debug/index_dump")
    assert status == 200
    lines = body.decode().strip().splitlines()
    assert len(lines) >= 2
    # CSV shape: 60-bit id, canonical sorted-labels JSON
    sid, sj = lines[0].split(",", 1)
    assert int(sid) > 0 and json.loads(sj)

    import urllib.parse

    sel = urllib.parse.quote('http_requests_total{inst="a"}')
    status, body = _get_raw(
        f"{base}/debug/index_dump_by_labels?match[]={sel}"
    )
    assert status == 200
    lines = [l for l in body.decode().strip().splitlines() if l]
    assert len(lines) >= 1
    assert all(json.loads(l.split(",", 1)[1]).get("inst") == "a"
               for l in lines)


def test_debug_index_dump_by_expiration_and_shard(base, written):
    # the `written` fixture posts TTL=86400 s at ts 10-130 s epoch ->
    # every series expires on 1970-01-02
    status, body = _get_raw(
        f"{base}/debug/index_dump_by_expiration?date=1970-01-02"
    )
    assert status == 200
    assert len(body.decode().strip().splitlines()) >= 2
    status, body = _get_raw(
        f"{base}/debug/index_dump_by_expiration?date=2030-01-01"
    )
    assert status == 200 and body == b""
    # all sample timestamps fall in the 1970-01-01 date shard
    status, body = _get_raw(
        f"{base}/debug/index_dump_by_shard?date=1970-01-01"
    )
    assert status == 200
    assert len(body.decode().strip().splitlines()) >= 2
    # missing parameter -> Prometheus error shape
    status, out = _get(f"{base}/debug/index_dump_by_expiration")
    assert status == 400 and out["errorType"] == "bad_data"


def test_debug_block_not_implemented(base):
    status, body = _get_raw(f"{base}/debug/index_block")
    assert status == 501 and b"does not implement" in body


def test_debug_toggle_query_captures(base, server, written):
    status, out = _get(f"{base}/debug/toggle_debug_query")
    assert status == 200 and out["debug_query"] is True
    _get(
        f"{base}/api/v1/query?query=http_requests_total&time=130",
        {"X-SquirrelDB-Tenant": "t0"},
    )
    assert "http_requests_total" in server._debug_queries
    status, out = _get(f"{base}/debug/toggle_debug_query")
    assert status == 200 and out["debug_query"] is False


def test_debug_mutable_import_dry_run_then_force(base, server, written):
    entries = {"data": [{
        "tenant": "t7", "mutable_name": "team", "mutable_value": "core",
        "associated_name": "inst", "associated_values": ["a", "b"],
    }]}
    body = json.dumps(entries).encode()
    status, out = _post(f"{base}/debug/mutable_import", body)
    out = json.loads(out)
    assert status == 200 and out["status"] == "dry-run"
    assert not any(
        r.tenant == "t7" for r in server.mutable_store.rows()
    )
    status, out = _post(f"{base}/debug/mutable_import?force", body)
    out = json.loads(out)
    assert status == 200 and out["imported"] == 1
    # dump -> import is a round trip
    status, dump = _get(f"{base}/debug/mutable_dump")
    assert any(
        r["tenant"] == "t7" and r["associated_values"] == ["a", "b"]
        for r in dump["data"]
    )


def test_streamed_read_planning_error_yields_json_not_corrupt_stream(spark):
    """Regression: a planning error (unknown label on a fixed-schema
    store) used to surface AFTER the 200 + streamed headers were
    committed, splicing a JSON error into the chunk stream. The first
    frame is now pulled before the headers, so the client gets a proper
    JSON 400."""
    import pyspark.sql.functions as SF

    base_pts = spark.createDataFrame(
        [(1, 10_000, 1.0)], "user_id long, ts long, value double"
    ).withColumn("__name__", SF.lit("m"))
    srv = PromHTTPServer(
        spark,
        base_points=base_pts,
        label_cols=("user_id",),
        labels_map_col=None,
        tenant_col=None,
    ).start()
    try:
        body = codec.encode_read_request(
            [codec.Query(
                start_timestamp_ms=0, end_timestamp_ms=1_000_000,
                matchers=[("=", "no_such_label", "x")],
            )],
            accepted_response_types=[codec.READ_STREAMED_XOR_CHUNKS],
        )
        status, raw = _post(
            f"http://127.0.0.1:{srv.port}/api/v1/read",
            codec.snappy_compress(body),
            {"Content-Encoding": "snappy",
             "Content-Type": "application/x-protobuf"},
        )
        assert status == 400
        out = json.loads(raw)
        assert out["status"] == "error" and out["errorType"] == "bad_data"
    finally:
        srv.stop()


def test_remote_read_negotiation_prefers_first_accepted(base, written):
    """Regression: a client listing [SAMPLES, STREAMED] prefers SAMPLES;
    the server must honor the ORDER, not just membership."""
    body = codec.encode_read_request(
        [codec.Query(
            start_timestamp_ms=0, end_timestamp_ms=1_000_000,
            matchers=[("=", "__name__", "http_requests_total")],
        )],
        accepted_response_types=[
            codec.READ_SAMPLES, codec.READ_STREAMED_XOR_CHUNKS
        ],
    )
    req = urllib.request.Request(
        f"{base}/api/v1/read",
        data=codec.snappy_compress(body), method="POST",
        headers={"Content-Encoding": "snappy",
                 "Content-Type": "application/x-protobuf",
                 "X-SquirrelDB-Tenant": "t0"},
    )
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200
        # the plain (non-streamed) protobuf response
        assert resp.headers["Content-Type"] == "application/x-protobuf"
        raw = resp.read()
    results = codec.decode_read_response(codec.snappy_decompress(raw))
    assert results and results[0]


def test_instant_query_defaults_time_to_now(base, written):
    status, out = _get(
        f"{base}/api/v1/query?query=http_requests_total",
        {"X-SquirrelDB-Tenant": "t0"},
    )
    # valid per the upstream API (time optional); samples are ancient so
    # the result is empty, but the request must succeed
    assert status == 200 and out["status"] == "success"


def test_series_union_of_repeated_match_params(base, written):
    status, out = _get(
        f"{base}/api/v1/series?match[]="
        + urllib.parse.quote('http_requests_total{inst="a"}')
        + "&match[]=" + urllib.parse.quote('http_requests_total{inst="b"}'),
        {"X-SquirrelDB-Tenant": "t0"},
    )
    assert status == 200
    insts = sorted(e["inst"] for e in out["data"])
    assert insts == ["a", "b"]


def test_rfc3339_timestamps_accepted(base, written):
    status, out = _get(
        f"{base}/api/v1/query_range?query=http_requests_total"
        "&start=1970-01-01T00:00:00Z&end=1970-01-01T00:02:10Z&step=60",
        {"X-SquirrelDB-Tenant": "t0"},
    )
    assert status == 200 and out["status"] == "success"
    assert out["data"]["result"]


def test_timeout_accepts_duration_string(base, written):
    status, out = _get(
        f"{base}/api/v1/query?query=http_requests_total&time=130&timeout=30s",
        {"X-SquirrelDB-Tenant": "t0"},
    )
    assert status == 200 and out["status"] == "success"


def test_canonical_series_json_matches_spark_to_json(spark):
    """ADVICE r4: the /debug/index_dump_by_labels fallback must emit the
    SAME canonical labels JSON as _SERIES_JSON's to_json(map) — values
    stringified (longs quoted), keys sorted, compact separators, null
    labels dropped — so the 60-bit ids agree across the two dumps."""
    from pyspark.sql import functions as F

    from squirreldb_spark.http_api import _SERIES_JSON, _canonical_series_json

    df = spark.createDataFrame(
        [({"job": "api", "shard": "7", "inst": "a"},)], "labels map<string,string>"
    )
    want = df.select(F.expr(_SERIES_JSON).alias("s")).collect()[0]["s"]
    # column-store row shape: a long-typed label and a NULL label
    got = _canonical_series_json(
        {"job": "api", "shard": 7, "inst": "a", "extra": None}
    )
    assert got == want


def test_format_query_endpoint(base):
    """Upstream formatQuery (mounted by the reference via v1.NewAPI):
    success with the prettified string; missing query -> bad_data."""
    q = urllib.parse.quote("sum by(job)  ( rate( m[5m] ) )")
    code, body = _get(f"{base}/api/v1/format_query?query={q}")
    assert code == 200 and body["status"] == "success"
    assert body["data"] == "sum by (job) (rate(m[5m]))"
    code, body = _get(f"{base}/api/v1/format_query")
    assert code == 400 and body["errorType"] == "bad_data"
    # a parse error is bad_data too
    bad = urllib.parse.quote("sum by (")
    code, body = _get(f"{base}/api/v1/format_query?query={bad}")
    assert code == 400 and body["errorType"] == "bad_data"


def test_mocked_v1_surface_matches_reference(base):
    """The reference mounts the whole upstream v1 router with mock
    retrievers (api/api.go:131-201, api/mock.go): empty scrape/rule/
    alertmanager state, errNotImplemented for exemplars and runtime/TSDB
    stats. Every route must answer with that exact shape, not 404."""
    ok = {
        "/api/v1/status/buildinfo": lambda d: d["data"]["version"] == "",
        "/api/v1/status/flags": lambda d: d["data"] is None,
        "/api/v1/status/config": lambda d: "scrape_interval" in d["data"]["yaml"],
        "/api/v1/targets": lambda d: d["data"]["activeTargets"] == [],
        "/api/v1/targets/metadata": lambda d: d["data"] == [],
        "/api/v1/metadata": lambda d: d["data"] == {},
        "/api/v1/scrape_pools": lambda d: d["data"]["scrapePools"] is None,
        "/api/v1/rules": lambda d: d["data"]["groups"] == [],
        "/api/v1/alerts": lambda d: d["data"]["alerts"] == [],
        "/api/v1/alertmanagers": lambda d: d["data"]["activeAlertmanagers"] == [],
    }
    for path, check in ok.items():
        code, body = _get(base + path)
        assert code == 200 and body["status"] == "success", (path, body)
        assert check(body), (path, body)
    for path in ("/api/v1/status/runtimeinfo", "/api/v1/status/tsdb",
                 "/api/v1/status/walreplay", "/api/v1/query_exemplars"):
        code, body = _get(base + path)
        assert code == 500, (path, code)
        assert body == {"status": "error", "errorType": "internal",
                        "error": "not implemented"}, (path, body)


def test_parse_query_endpoint(base):
    """parse_query (v3.4+): translated AST JSON in the upstream
    translate_ast.go shape."""
    q = urllib.parse.quote('sum by (job) (rate(m{env="prod"}[5m])) / scalar(n)')
    code, body = _get(f"{base}/api/v1/parse_query?query={q}")
    assert code == 200 and body["status"] == "success"
    d = body["data"]
    assert d["type"] == "binaryExpr" and d["op"] == "/"
    assert d["matching"] is None                      # scalar rhs
    agg = d["lhs"]
    assert agg["type"] == "aggregation" and agg["grouping"] == ["job"]
    call = agg["expr"]
    assert call["func"] == {"name": "rate", "argTypes": ["matrix"],
                            "variadic": 0, "returnType": "vector"}
    sel = call["args"][0]
    assert sel["type"] == "matrixSelector" and sel["range"] == 300000
    assert {"name": "__name__", "type": "=", "value": "m"} in sel["matchers"]
    assert {"name": "env", "type": "=", "value": "prod"} in sel["matchers"]
    # vector-vector default matching is one-to-one
    q2 = urllib.parse.quote("a + b")
    _, body2 = _get(f"{base}/api/v1/parse_query?query={q2}")
    assert body2["data"]["matching"] == {
        "card": "one-to-one", "labels": [], "on": False, "include": [],
    }
    code, body3 = _get(f"{base}/api/v1/parse_query?query=sum%20by%20(")
    assert code == 400 and body3["errorType"] == "bad_data"
