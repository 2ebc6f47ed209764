"""Wire-codec tests: prompb protobuf subset + snappy block format.

Golden byte strings are hand-assembled from the public format specs
(protobuf encoding docs, google/snappy format_description.txt), mirroring
the reference's write_req fixtures strategy
(api/remotestorage/write_test.go) without copying its payloads.
"""

import struct

import pytest

from squirreldb_spark import codec
from squirreldb_spark.codec import Query, Sample, TimeSeries


# ----------------------------------------------------------------- varint


def test_uvarint_roundtrip():
    for n in [0, 1, 127, 128, 300, 2**32, 2**63 - 1, 2**64 - 1]:
        buf = codec.write_uvarint(n)
        got, pos = codec.read_uvarint(buf, 0)
        assert got == n and pos == len(buf)


def test_uvarint_golden():
    # canonical protobuf example: 300 -> 0xAC 0x02
    assert codec.write_uvarint(300) == b"\xac\x02"


# --------------------------------------------------------------- protobuf


def _ts():
    return TimeSeries(
        labels={"__name__": "http_requests_total", "job": "api", "instance": "i-1"},
        samples=[Sample(1027.0, 1_700_000_000_000), Sample(1028.5, 1_700_000_015_000)],
    )


def test_write_request_roundtrip():
    series = [_ts(), TimeSeries(labels={"__name__": "up"}, samples=[Sample(1.0, 5)])]
    buf = codec.encode_write_request(series)
    out = codec.decode_write_request(buf)
    assert len(out) == 2
    assert out[0].labels == series[0].labels
    assert [(s.value, s.timestamp_ms) for s in out[0].samples] == [
        (1027.0, 1_700_000_000_000), (1028.5, 1_700_000_015_000)]
    assert out[1].labels == {"__name__": "up"}


def test_write_request_golden_bytes():
    """Hand-assembled WriteRequest{TimeSeries{Label{n,v}, Sample{2.5, 3}}}."""
    label = b"\x0a\x01n" + b"\x12\x01v"                 # name="n", value="v"
    sample = b"\x09" + struct.pack("<d", 2.5) + b"\x10\x03"  # value=2.5 ts=3
    ts = b"\x0a" + bytes([len(label)]) + label + b"\x12" + bytes([len(sample)]) + sample
    req = b"\x0a" + bytes([len(ts)]) + ts
    assert codec.encode_write_request(
        [TimeSeries(labels={"n": "v"}, samples=[Sample(2.5, 3)])]
    ) == req
    out = codec.decode_write_request(req)
    assert out[0].labels == {"n": "v"}
    assert out[0].samples[0] == Sample(2.5, 3)


def test_decoder_skips_unknown_fields():
    # append an unknown field 15 (varint) and 9 (length-delimited) to a
    # TimeSeries payload: current-Prometheus exemplars/histograms style
    base = codec.encode_timeseries(_ts())
    noise = b"\x78\x2a" + b"\x4a\x03abc"  # field 15 varint 42; field 9 "abc"
    out = codec.decode_timeseries(base + noise)
    assert out.labels == _ts().labels and len(out.samples) == 2


def test_negative_timestamp_roundtrip():
    ts = TimeSeries(labels={"a": "b"}, samples=[Sample(-1.5, -62_135_596_800_000)])
    out = codec.decode_write_request(codec.encode_write_request([ts]))
    assert out[0].samples[0].timestamp_ms == -62_135_596_800_000
    assert out[0].samples[0].value == -1.5


def test_read_request_roundtrip():
    q = Query(
        start_timestamp_ms=1000, end_timestamp_ms=2000,
        matchers=[("=", "__name__", "up"), ("=~", "job", "a.*"), ("!=", "x", "y")],
    )
    out = codec.decode_read_request(codec.encode_read_request([q]))
    assert out[0].start_timestamp_ms == 1000
    assert out[0].end_timestamp_ms == 2000
    assert out[0].matchers == q.matchers


def test_read_response_roundtrip():
    results = [[_ts()], [TimeSeries(labels={"z": "1"}, samples=[Sample(0.0, 0)])]]
    out = codec.decode_read_response(codec.encode_read_response(results))
    assert len(out) == 2 and out[0][0].labels == _ts().labels
    assert out[1][0].labels == {"z": "1"}


# ----------------------------------------------------------------- snappy


def test_snappy_literal_roundtrip():
    for payload in [b"", b"x", b"hello world" * 10, bytes(range(256)) * 300]:
        assert codec.snappy_decompress(codec.snappy_compress(payload)) == payload


def test_snappy_copy_ops_decode():
    """Hand-built compressed stream exercising copy elements (RLE-style
    overlapping copy included): literal 'abcd' + copy(offset=4, len=8)
    -> 'abcdabcdabcd'."""
    lit = bytes([(4 - 1) << 2]) + b"abcd"
    # tag 01: len 4..11 in bits 2-4 -> len 8 = (8-4)<<2 | 1; offset 4 (high
    # bits 0, low byte 4)
    copy1 = bytes([((8 - 4) << 2) | 1, 4])
    data = codec.write_uvarint(12) + lit + copy1
    assert codec.snappy_decompress(data) == b"abcdabcdabcd"


def test_snappy_two_byte_offset_copy():
    filler = bytes(100)
    lit = bytes([60 << 2, len(filler) + 4 - 1]) + filler + b"wxyz"
    # tag 10: len-1 in upper 6 bits, 2-byte LE offset
    copy2 = bytes([((4 - 1) << 2) | 2]) + (104).to_bytes(2, "little")
    data = codec.write_uvarint(104 + 4) + lit + copy2
    out = codec.snappy_decompress(data)
    assert out == filler + b"wxyz" + filler[:4]


def test_snappy_corrupt_raises():
    with pytest.raises(ValueError):
        codec.snappy_decompress(codec.write_uvarint(4) + bytes([1 | 1, 9]))  # offset 9 > out
    with pytest.raises(ValueError):  # declared length mismatch
        codec.snappy_decompress(codec.write_uvarint(99) + bytes([0]) + b"a")


# --------------------------------------------------------- remote read/write


def test_remote_write_body_roundtrip():
    body = codec.encode_remote_write_body([_ts()])
    out = codec.decode_remote_write_body(body)
    assert out[0].labels == _ts().labels and len(out[0].samples) == 2


def test_api_decode_remote_write_to_dataframe(spark):
    from squirreldb_spark.api import decode_remote_write

    body = codec.encode_remote_write_body([_ts()])
    df = decode_remote_write(body, spark=spark)
    rows = df.collect()
    assert len(rows) == 2
    assert rows[0].labels["job"] == "api"
    assert {r.value for r in rows} == {1027.0, 1028.5}
    assert dict(df.dtypes)["labels"] == "map<string,string>"


def test_api_remote_read_end_to_end(spark):
    from squirreldb_spark.api import PromAPI

    pts = spark.createDataFrame(
        [("a", "cpu", 1000, 1.0), ("a", "cpu", 2000, 2.0),
         ("b", "cpu", 1500, 5.0), ("a", "mem", 1500, 9.0)],
        "host string, name string, ts long, value double",
    )
    api = PromAPI(pts, label_cols=("host", "name"), name_label="name")
    body = codec.snappy_compress(codec.encode_read_request([
        Query(start_timestamp_ms=0, end_timestamp_ms=3000,
              matchers=[("=", "__name__", "cpu")]),
    ]))
    results = codec.decode_read_response(codec.snappy_decompress(api.remote_read(body)))
    assert len(results) == 1
    by_labels = {tuple(sorted(ts.labels.items())): ts for ts in results[0]}
    a_cpu = by_labels[(("host", "a"), ("name", "cpu"))]
    assert [(s.value, s.timestamp_ms) for s in a_cpu.samples] == [(1.0, 1000), (2.0, 2000)]
    assert (("host", "b"), ("name", "cpu")) in by_labels
    assert (("host", "a"), ("name", "mem")) not in by_labels


def test_write_request_v2_roundtrip():
    series = [_ts(), TimeSeries(labels={"__name__": "up"}, samples=[Sample(1.0, 5)])]
    out = codec.decode_write_request_v2(codec.encode_write_request_v2(series))
    assert [t.labels for t in out] == [t.labels for t in series]
    assert [(s.value, s.timestamp_ms) for s in out[0].samples] == [
        (1027.0, 1_700_000_000_000), (1028.5, 1_700_000_015_000)]


def test_write_request_v2_interns_symbols():
    # shared names/values must appear once in the symbol table
    series = [
        TimeSeries(labels={"__name__": "up", "job": "api"}, samples=[Sample(1.0, 1)]),
        TimeSeries(labels={"__name__": "up", "job": "db"}, samples=[Sample(2.0, 1)]),
    ]
    buf = codec.encode_write_request_v2(series)
    symbols = [v.decode() for f, w, v in codec.iter_fields(buf) if f == 4]
    assert symbols[0] == ""
    assert symbols.count("up") == 1 and symbols.count("__name__") == 1
    assert codec.decode_write_request_v2(buf)[1].labels == {
        "__name__": "up", "job": "db"}


def test_write_request_version_sniff():
    series = [TimeSeries(labels={"a": "b"}, samples=[Sample(7.0, 42)])]
    v1 = codec.encode_write_request(series)
    v2 = codec.encode_write_request_v2(series)
    assert codec.decode_write_request_any(v1)[0].labels == {"a": "b"}
    assert codec.decode_write_request_any(v2)[0].labels == {"a": "b"}
    assert codec.decode_write_request_any(b"") == []


def test_remote_write_body_v2_and_proto_param():
    series = [TimeSeries(labels={"a": "b"}, samples=[Sample(7.0, 42)])]
    body = codec.encode_remote_write_body_v2(series)
    for proto in (None, "io.prometheus.write.v2.Request"):
        out = codec.decode_remote_write_body(body, proto=proto)
        assert out[0].labels == {"a": "b"}
        assert out[0].samples[0] == Sample(7.0, 42)
    v1_body = codec.encode_remote_write_body(series)
    assert codec.decode_remote_write_body(
        v1_body, proto="prometheus.WriteRequest")[0].labels == {"a": "b"}


def test_otlp_metrics_roundtrip():
    series = [
        TimeSeries(labels={"__name__": "cpu_usage", "core": "0"},
                   samples=[Sample(0.5, 1_000), Sample(0.7, 2_000)]),
        TimeSeries(labels={"__name__": "cpu_usage", "core": "1"},
                   samples=[Sample(0.9, 1_000)]),
    ]
    buf = codec.encode_otlp_metrics(series, resource_attrs={"host": "h1"})
    out = sorted(codec.decode_otlp_metrics(buf),
                 key=lambda t: t.labels["core"])
    assert [t.labels for t in out] == [
        {"host": "h1", "core": "0", "__name__": "cpu_usage"},
        {"host": "h1", "core": "1", "__name__": "cpu_usage"},
    ]
    assert [(s.value, s.timestamp_ms) for s in out[0].samples] == [
        (0.5, 1_000), (0.7, 2_000)]


def test_otlp_label_sanitization():
    series = [TimeSeries(labels={"__name__": "http.server.duration",
                                 "span.kind": "server"},
                         samples=[Sample(1.0, 1_000)])]
    out = codec.decode_otlp_metrics(codec.encode_otlp_metrics(series))
    assert out[0].labels == {"__name__": "http_server_duration",
                             "span_kind": "server"}


def _xor_roundtrip(samples):
    enc = codec.encode_xor_chunk(samples)
    dec = codec.decode_xor_chunk(enc)
    assert len(dec) == len(samples)
    import math

    for a, b in zip(samples, dec):
        assert a.timestamp_ms == b.timestamp_ms
        if math.isnan(a.value):
            assert math.isnan(b.value)
        else:
            assert a.value == b.value
    return enc


def test_xor_chunk_roundtrip_shapes():
    S = Sample
    _xor_roundtrip([])
    _xor_roundtrip([S(1.5, 1_000)])
    _xor_roundtrip([S(1.0, 1_000), S(1.0, 2_000)])  # zero XOR delta
    _xor_roundtrip([S(float("nan"), 0), S(float("inf"), 10),
                    S(-float("inf"), 17), S(-0.0, 1_003)])
    _xor_roundtrip([S(0.1 * i, -5_000_000 + i * 13_777) for i in range(50)])
    # regular counter series compresses hard (the Gorilla headline case)
    enc = _xor_roundtrip([S(float(i), 1_000 * i) for i in range(120)])
    assert len(enc) < 120 * 4


def test_xor_chunk_roundtrip_random():
    import random

    random.seed(7)
    ts = sorted(random.sample(range(10**12), 300))
    _xor_roundtrip([Sample(random.uniform(-1e12, 1e12), t) for t in ts])
    # large delta-of-deltas exercise the 17/20/64-bit dod branches
    _xor_roundtrip([Sample(2.0**i - 1, i**5 + i) for i in range(40)])


def test_chunked_read_response_roundtrip_and_framing():
    cs = codec.ChunkedSeries(
        labels={"__name__": "m", "inst": "a"},
        chunks=[(10, 30, codec.XOR_ENCODING,
                 codec.encode_xor_chunk([Sample(1.0, 10), Sample(2.0, 30)]))],
    )
    msg = codec.encode_chunked_read_response([cs], query_index=3)
    series, qi = codec.decode_chunked_read_response(msg)
    assert qi == 3 and series[0].labels == cs.labels
    assert series[0].chunks == cs.chunks
    stream = codec.frame_chunked_message(msg) + codec.frame_chunked_message(msg)
    frames = list(codec.iter_chunked_frames(stream))
    assert frames == [msg, msg]
    # CRC must catch corruption
    corrupted = bytearray(codec.frame_chunked_message(msg))
    corrupted[-1] ^= 0xFF
    import pytest as _pytest

    with _pytest.raises(ValueError):
        list(codec.iter_chunked_frames(bytes(corrupted)))


def test_read_request_accepted_types():
    q = codec.Query(0, 100, [("=", "a", "b")])
    plain = codec.encode_read_request([q])
    assert codec.decode_read_request_accepted_types(plain) == [
        codec.READ_SAMPLES
    ]
    streamed = codec.encode_read_request(
        [q], accepted_response_types=[codec.READ_STREAMED_XOR_CHUNKS]
    )
    assert codec.decode_read_request_accepted_types(streamed) == [
        codec.READ_STREAMED_XOR_CHUNKS
    ]
    # queries decode identically with the extra field present
    assert codec.decode_read_request(streamed)[0].matchers == q.matchers


def test_label_sanitization_is_ascii_only():
    # non-ASCII OTLP attribute keys must map into [a-zA-Z0-9_] — Unicode
    # letters are NOT valid Prometheus label-name characters
    assert codec._sanitize_label("café") == "caf_"
    assert codec._sanitize_label("日本語") == "___"
    assert codec._sanitize_label("0始まり") == "_0___"
    assert codec._sanitize_label("ok_name9") == "ok_name9"


def test_prw2_out_of_range_symbol_ref_raises_valueerror():
    """Regression: a labels_ref past the symbol table raised a bare
    IndexError; malformed input must fail with the codec's ValueError."""
    from squirreldb_spark import codec

    import pytest as _pt

    # craft a v2 message whose labels_refs point beyond the symbol table
    sym = b"\x22\x00"  # field 4 (symbols): empty string at index 0
    # field 5 (timeseries) -> field 1 (labels_refs, packed): [9, 9]
    ts_body = b"\x0a\x02\x09\x09"
    msg = sym + b"\x2a" + bytes([len(ts_body)]) + ts_body
    with _pt.raises(ValueError, match="out of range"):
        codec.decode_write_request_v2(msg)


def test_read_request_unknown_matcher_type_raises_valueerror():
    from squirreldb_spark import codec

    # Query (field 1) containing a matcher (field 3) with type enum 9
    matcher = b"\x08\x09\x12\x01x\x1a\x01y"  # type=9, name=x, value=y
    q = b"\x1a" + bytes([len(matcher)]) + matcher
    msg = b"\x0a" + bytes([len(q)]) + q
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown matcher type"):
        codec.decode_read_request(msg)


def test_xor_chunk_and_framed_stream_golden_digests():
    """VERDICT r4 #7: pin the streamed-remote-read encoder byte-for-byte.
    Roundtrip fuzz proves self-consistency; these frozen md5 digests
    catch a symmetric encode/decode drift (both sides changing together)
    that fuzz can't.  Layout sanity is asserted structurally too: the
    upstream chunkenc XOR chunk opens with a big-endian uint16 sample
    count (prometheus/tsdb/chunkenc/xor.go)."""
    import hashlib

    S = Sample
    c1 = codec.encode_xor_chunk([S(float(i), 1_000 * i) for i in range(120)])
    assert c1[:2] == (120).to_bytes(2, "big")
    assert hashlib.md5(c1).hexdigest() == "01824c2c4c2c93b9594777d2eef8d5f1"
    c2 = codec.encode_xor_chunk([
        S(float("nan"), 0), S(float("inf"), 10),
        S(-float("inf"), 17), S(-0.0, 1_003),
    ])
    assert hashlib.md5(c2).hexdigest() == "82af91033bfd3dca206055550c4a9ede"
    # large delta-of-deltas: every dod bit-width branch
    c3 = codec.encode_xor_chunk([S(2.0**i - 1, i**5 + i) for i in range(40)])
    assert hashlib.md5(c3).hexdigest() == "8ab4b6ecef5e0943880d9673fcaa242b"
    # full framed ChunkedReadResponse: protobuf message + uvarint/crc32c
    # frame must both stay stable
    cs = codec.ChunkedSeries(
        labels={"__name__": "m", "inst": "a"},
        chunks=[(0, 119_000, codec.XOR_ENCODING, c1)],
    )
    msg = codec.encode_chunked_read_response([cs], query_index=3)
    assert hashlib.md5(msg).hexdigest() == "25a121a2f0ecaca6e6d315fc7a956b85"
    frame = codec.frame_chunked_message(msg)
    assert hashlib.md5(frame).hexdigest() == "cdf0c3e948ead577f382ac6996a14346"
    # frame = uvarint(len) + BE crc32c + payload
    assert frame.endswith(msg)
    assert frame[: len(frame) - len(msg) - 4] == codec.write_uvarint(len(msg))
    series, qi = codec.decode_chunked_read_response(msg)
    assert qi == 3 and series[0].chunks[0][3] == c1
