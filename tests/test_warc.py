"""WARC source: writer/parser round-trips, Content-Length discipline,
gzip member layouts, HTML extraction, and the distributed Spark lane."""

import gzip

import pytest

from luxo_rs_spark.sources.warc import (
    extract_warc_text,
    html_to_text,
    http_response_bytes,
    iter_warc_records,
    parse_http_response,
    read_warc,
    warc_record_bytes,
    warcinfo_bytes,
    write_warc_files,
)


def _resp_record(uri: str, body: bytes, gzip_member=True, **http_kw) -> bytes:
    return warc_record_bytes(
        record_type="response",
        payload=http_response_bytes(body, **http_kw),
        target_uri=uri,
        gzip_member=gzip_member,
    )


def test_roundtrip_multi_member_gzip():
    raw = warcinfo_bytes("f.warc.gz") + _resp_record(
        "https://a.example.com/1", b"<html>one</html>"
    ) + _resp_record("https://a.example.com/2", b"<html>two</html>")
    recs = list(iter_warc_records(raw))
    assert [r["headers"]["warc-type"] for r in recs] == [
        "warcinfo", "response", "response",
    ]
    status, hdrs, body = parse_http_response(recs[1]["payload"])
    assert status == 200 and body == b"<html>one</html>"
    assert hdrs["content-type"].startswith("text/html")


def test_roundtrip_plain_and_single_member():
    plain = _resp_record("u:1", b"abc", gzip_member=False) + _resp_record(
        "u:2", b"defg", gzip_member=False
    )
    assert [
        parse_http_response(r["payload"])[2]
        for r in iter_warc_records(plain)
    ] == [b"abc", b"defg"]
    # a SINGLE gzip member holding many records must also parse
    one_member = gzip.compress(plain)
    assert len(list(iter_warc_records(one_member))) == 2


def test_content_length_governs_not_delimiters():
    """A body containing CRLFCRLF (the header terminator) must survive:
    payloads are sliced by Content-Length, never delimiter-scanned."""
    evil = b"part1\r\n\r\nWARC/1.0\r\n\r\npart2"
    raw = _resp_record("u:evil", evil) + _resp_record("u:after", b"ok")
    recs = list(iter_warc_records(raw))
    assert len(recs) == 2
    assert parse_http_response(recs[0]["payload"])[2] == evil
    assert parse_http_response(recs[1]["payload"])[2] == b"ok"


def test_record_spanning_gzip_member_boundary():
    """Non-CC layout: one record split across two gzip members —
    the incremental parser must buffer across the boundary."""
    rec = _resp_record("u:span", b"x" * 500, gzip_member=False)
    cut = len(rec) // 2
    raw = gzip.compress(rec[:cut]) + gzip.compress(rec[cut:])
    recs = list(iter_warc_records(raw))
    assert len(recs) == 1
    assert parse_http_response(recs[0]["payload"])[2] == b"x" * 500


def test_html_to_text_strips_boilerplate():
    doc = (
        "<html><head><title> My &amp; Title </title>"
        "<style>p{color:red}</style></head>"
        "<body><h1>Head</h1><!-- hidden --><p>alpha &lt;beta&gt;</p>"
        "<script>var x='<p>not text</p>';</script>tail</body></html>"
    )
    title, text = html_to_text(doc)
    assert title == "My & Title"
    assert text == "Head alpha <beta> tail"


def test_spark_warc_lane_roundtrip(spark, tmp_path):
    """Distributed write (one warc.gz per partition) → binaryFile scan →
    mapInPandas parse → HTML extraction; text round-trips exactly."""
    rows = [(i, f"doc body number {i}", "en") for i in range(20)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).repartition(3)
    out = str(tmp_path / "warc")
    write_warc_files(
        docs,
        out,
        url_of=lambda r: f"https://w.example.com/docs/{r['doc_id']}",
        html_of=lambda r: (
            f"<html><head><title>D{r['doc_id']}</title></head>"
            f"<body><p>{r['text']}</p><script>x=1</script></body></html>"
        ),
    )
    recs = read_warc(spark, out)
    got = {
        r.target_uri: r
        for r in extract_warc_text(recs).collect()
    }
    assert len(got) == 20
    r5 = got["https://w.example.com/docs/5"]
    assert r5.text == "doc body number 5"
    assert r5.title == "D5"
    assert r5.http_status == 200 and r5.content_language == "en"
    # warcinfo records exist in the raw frame but not the extracted one
    assert (
        recs.filter("record_type = 'warcinfo'").count() == 3
    )  # one per non-empty partition


def test_streaming_warc_ingest_matches_batch(spark, tmp_path):
    """T3: the streaming lane (binaryFile file-source micro-batches)
    must surface exactly the records the batch lane reads — same
    corpus, stream-vs-batch equality, one file per-ish trigger."""
    rows = [(i, f"streamed body {i}", "en") for i in range(12)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).repartition(3)
    out = str(tmp_path / "warc_in")
    write_warc_files(
        docs,
        out,
        url_of=lambda r: f"https://s.example.com/docs/{r['doc_id']}",
        html_of=lambda r: f"<html><body><p>{r['text']}</p></body></html>",
    )
    from luxo_rs_spark.sources.warc import read_warc_stream

    stream = read_warc_stream(spark, out)
    assert stream.isStreaming
    q = (
        extract_warc_text(stream)
        .writeStream.format("memory")
        .queryName("warc_stream_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.target_uri: r.text
        for r in spark.sql("SELECT * FROM warc_stream_t").collect()
    }
    batch = {
        r.target_uri: r.text
        for r in extract_warc_text(read_warc(spark, out)).collect()
    }
    assert got == batch and len(got) == 12


def test_warc_stream_feeds_neardup_ingest(spark, tmp_path):
    """End-to-end live pipeline: WARC landing dir -> streaming ingest ->
    HTML extraction -> incremental MinHash-LSH near-dup admission. The
    near-duplicate page (same body, one token changed) must be dropped
    against the already-admitted original; distinct pages survive."""
    from pyspark.sql import functions as F

    from luxo_rs_spark.sources.warc import read_warc_stream
    from luxo_rs_spark.streaming.neardup_ingest import NearDupIngest

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (1, base, "en"),
        (2, base.replace("dog", "cat"), "en"),       # near-dup of 1
        (3, "completely different page body with unrelated words here", "en"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).coalesce(1)
    land = str(tmp_path / "land")
    write_warc_files(
        docs,
        land,
        url_of=lambda r: f"https://p.example.com/docs/{r['doc_id']}",
        html_of=lambda r: f"<html><body><p>{r['text']}</p></body></html>",
    )
    parsed = extract_warc_text(read_warc_stream(spark, land)).select(
        F.regexp_extract("target_uri", r"/docs/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        "text",
    )
    ingest = NearDupIngest(str(tmp_path / "store"), threshold=0.5)
    q = (
        parsed.writeStream.foreachBatch(ingest.process_batch)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    admitted = sorted(r["doc_id"] for r in ingest.admitted(spark).collect())
    assert 1 in admitted and 3 in admitted
    assert 2 not in admitted  # the near-dup was dropped on ingest


# ---------------------------------------------------------------------------
# CDX offset index + ranged reads (round-5)
# ---------------------------------------------------------------------------


def test_cdx_spans_tile_the_file(spark, tmp_path):
    """Per file: the indexed (offset, length) member spans are disjoint,
    monotone, and tile the ENTIRE file byte-for-byte — the property
    ranged reads depend on."""
    import os

    from luxo_rs_spark.sources.warc import build_cdx_index

    rows = [(i, f"tile body {i}", "en") for i in range(12)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).repartition(2)
    out = str(tmp_path / "warc")
    write_warc_files(
        docs,
        out,
        url_of=lambda r: f"u:{r['doc_id']}",
        html_of=lambda r: f"<html><body>{r['text']}</body></html>",
    )
    idx = build_cdx_index(spark, out).collect()
    by_file = {}
    for r in idx:
        by_file.setdefault(r.warc_file, []).append(r)
    assert len(by_file) == 2
    for fname, rs in by_file.items():
        spans = sorted({(r.offset, r.length) for r in rs})
        pos = 0
        for off, ln in spans:
            assert off == pos, (fname, off, pos)
            pos += ln
        assert pos == os.path.getsize(os.path.join(out, fname))
        assert pos == rs[0].file_bytes
        # CC layout: one record per member -> every seq is 0
        assert all(r.seq == 0 for r in rs)
    # 12 responses + 2 warcinfo
    assert sum(len(rs) for rs in by_file.values()) == 14


def test_cdx_ranged_read_matches_full_scan_and_is_pruned(spark, tmp_path):
    """The ranged probe returns byte-identical records to the full scan
    for the selected URIs while reading a fraction of the bytes."""
    from pyspark.sql import functions as F

    from luxo_rs_spark.sources.warc import build_cdx_index, read_warc_by_cdx

    rows = [(i, f"probe body {i} " + "pad " * 50, "en") for i in range(40)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).repartition(2)
    out = str(tmp_path / "warc")
    write_warc_files(
        docs,
        out,
        url_of=lambda r: f"https://x.example.com/d/{r['doc_id']}",
        html_of=lambda r: f"<html><body><p>{r['text']}</p></body></html>",
    )
    cdx = build_cdx_index(spark, out)
    # probe 4 of 40 documents
    want = {f"https://x.example.com/d/{i}" for i in (3, 17, 25, 39)}
    probe = cdx.filter(F.col("target_uri").isin(*want))
    got = read_warc_by_cdx(probe).collect()
    assert {r.target_uri for r in got} == want
    full = {
        r.target_uri: bytes(r.body)
        for r in read_warc(spark, out).filter(
            F.col("target_uri").isin(*want)
        ).collect()
    }
    for r in got:
        assert bytes(r.body) == full[r.target_uri]
        assert r.http_status == 200
    # economy: the probe touched only the selected members' bytes
    total_file_bytes = (
        cdx.select("warc_file", "file_bytes").distinct().groupBy().sum(
            "file_bytes"
        ).collect()[0][0]
    )
    bytes_read = sum(r.bytes_read for r in got)
    assert bytes_read == sum(
        r.length for r in probe.collect()
    )
    assert bytes_read < 0.5 * total_file_bytes, (
        bytes_read, total_file_bytes,
    )


def test_cdx_multi_record_member_seq_addressing(spark, tmp_path):
    """A single gzip member holding several records: every record is
    indexed with the same span but distinct seq, and the ranged read
    returns the seq-th record."""
    import gzip as _gz

    from luxo_rs_spark.sources.warc import build_cdx_index, read_warc_by_cdx

    plain = (
        _resp_record("u:a", b"alpha", gzip_member=False)
        + _resp_record("u:b", b"bravo", gzip_member=False)
        + _resp_record("u:c", b"charlie", gzip_member=False)
    )
    p = tmp_path / "one.warc.gz"
    p.write_bytes(_gz.compress(plain, 6))
    cdx = build_cdx_index(spark, str(tmp_path))
    rows = sorted(cdx.collect(), key=lambda r: r.seq)
    assert [r.seq for r in rows] == [0, 1, 2]
    assert len({(r.offset, r.length) for r in rows}) == 1
    got = {
        r.target_uri: bytes(r.body)
        for r in read_warc_by_cdx(cdx).collect()
    }
    assert got == {
        "u:a": b"alpha",
        "u:b": b"bravo",
        "u:c": b"charlie",
    }


def test_cdx_rejects_member_spanning_records():
    """Spanning records can't be addressed by one (offset, length) —
    the indexer must refuse rather than emit a lying index."""
    import gzip as _gz

    from luxo_rs_spark.sources.warc import iter_warc_records_with_spans

    rec = _resp_record("u:span", b"y" * 400, gzip_member=False)
    cut = len(rec) // 2
    raw = _gz.compress(rec[:cut]) + _gz.compress(rec[cut:])
    with pytest.raises(NotImplementedError):
        list(iter_warc_records_with_spans(raw))


def test_cdx_plain_warc_spans():
    """Uncompressed WARCs index by raw record byte spans."""
    from luxo_rs_spark.sources.warc import iter_warc_records_with_spans

    raw = _resp_record("u:1", b"one", gzip_member=False) + _resp_record(
        "u:2", b"two", gzip_member=False
    )
    spans = list(iter_warc_records_with_spans(raw))
    assert len(spans) == 2
    (o1, l1, s1, r1), (o2, l2, s2, r2) = spans
    assert o1 == 0 and o2 == o1 + l1 and o2 + l2 == len(raw)
    # ranged slice reparses to the same record
    from luxo_rs_spark.sources.warc import iter_warc_records

    again = list(iter_warc_records(raw[o2 : o2 + l2]))
    assert again[0]["payload"] == r2["payload"]


def test_warc_stream_crash_between_store_commit_and_checkpoint(
    spark, tmp_path
):
    """Failure injection for the streaming WARC ingest's exactly-once
    claim (round-4 verdict item 5, WARC half): crash the query right
    AFTER NearDupIngest persisted batch B's store partitions but
    BEFORE Spark's checkpoint committed B, restart from the same
    checkpoint, and the admitted set must equal a crash-free reference
    run — the replayed batch's partition overwrite + before_batch store
    read make the replay idempotent (no dup admits, no lost docs)."""
    import os

    from pyspark.sql import functions as F

    from luxo_rs_spark.sources.warc import read_warc_stream
    from luxo_rs_spark.streaming.neardup_ingest import NearDupIngest

    rows = [
        (i, f"document number {i} with its own unique words w{i} x{i}", "en")
        for i in range(8)
    ]
    # doc 100 near-dups doc 0 but lands in a LATER file/batch
    rows2 = [
        (100, "document number 0 with its own unique words w0 x0", "en")
    ]

    def land_files(dirname):
        land = str(tmp_path / dirname)
        docs1 = spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        ).repartition(4, "doc_id")
        write_warc_files(
            docs1,
            land,
            url_of=lambda r: f"https://c.example.com/docs/{r['doc_id']}",
            html_of=lambda r: f"<html><body><p>{r['text']}</p></body></html>",
        )
        docs2 = spark.createDataFrame(
            rows2, "doc_id long, text string, lang string"
        ).coalesce(1)
        # distinct filename so both waves coexist in the landing dir
        sub = str(tmp_path / (dirname + "_w2"))
        write_warc_files(
            docs2,
            sub,
            url_of=lambda r: f"https://c.example.com/docs/{r['doc_id']}",
            html_of=lambda r: f"<html><body><p>{r['text']}</p></body></html>",
        )
        for f in os.listdir(sub):
            os.rename(os.path.join(sub, f), os.path.join(land, "late-" + f))
        return land

    def parsed_stream(land):
        return extract_warc_text(
            read_warc_stream(spark, land, max_files_per_trigger=1)
        ).select(
            F.regexp_extract("target_uri", r"/docs/(\d+)$", 1)
            .cast("long")
            .alias("doc_id"),
            "text",
        )

    def run(land, store, ckpt, hook):
        q = (
            parsed_stream(land)
            .writeStream.foreachBatch(hook)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        return q

    # reference: crash-free run
    land_ref = land_files("land_ref")
    ref = NearDupIngest(str(tmp_path / "store_ref"), threshold=0.5)
    q = run(land_ref, None, str(tmp_path / "ck_ref"), ref.process_batch)
    q.awaitTermination(240)
    want = sorted(r["doc_id"] for r in ref.admitted(spark).collect())
    assert 100 not in want and len(want) == 8  # near-dup dropped

    # injected run: crash after the store commit of batch 1
    land2 = land_files("land_crash")
    ingest = NearDupIngest(str(tmp_path / "store_crash"), threshold=0.5)

    def crashing(batch_df, batch_id):
        ingest.process_batch(batch_df, batch_id)
        if batch_id == 1:
            raise RuntimeError("injected crash after store commit")

    ckpt = str(tmp_path / "ck_crash")
    q = run(land2, None, ckpt, crashing)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(240)
    committed = {
        int(f) for f in os.listdir(os.path.join(ckpt, "commits")) if f.isdigit()
    }
    assert 1 not in committed  # crashed inside the window

    q2 = run(land2, None, ckpt, ingest.process_batch)
    q2.awaitTermination(240)
    got = sorted(r["doc_id"] for r in ingest.admitted(spark).collect())
    assert got == want, (got, want)
