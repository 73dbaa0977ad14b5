"""Property-based tests (hypothesis) for the round-4 codecs: the WARC
record parser and the lossless-JPEG (SOF3) DPCM codec. Round-trip
identity must hold for ALL inputs in the supported envelope, not just
the hand-built goldens — adversarial payloads (0xFF runs, embedded
CRLFCRLF / WARC magic), arbitrary gzip member splits, and the full
predictor × point-transform × precision grid."""

from __future__ import annotations

import gzip

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from luxo_rs_spark.multimodal.media import (
    _decode_jpeg,
    _pixels_to_jpeg_lossless,
)
from luxo_rs_spark.sources.warc import (
    http_response_bytes,
    iter_warc_records,
    parse_http_response,
    warc_record_bytes,
)

# payloads biased toward parser-hostile bytes: 0xFF (JPEG/gzip magic),
# CRLF pairs, and the WARC version string itself
_HOSTILE = st.binary(min_size=0, max_size=300) | st.sampled_from(
    [
        b"\r\n\r\nWARC/1.0\r\n\r\n",
        b"\xff" * 64,
        b"Content-Length: 999\r\n\r\n",
        b"\x1f\x8b\x08\x00fakegzip",
    ]
)


@settings(max_examples=100, deadline=None)
@given(st.lists(_HOSTILE, min_size=1, max_size=6), st.booleans())
def test_warc_roundtrip_arbitrary_payloads(bodies, member_per_record):
    """N records with arbitrary bodies -> serialize -> parse: the exact
    bodies come back, in order, under both gzip layouts."""
    raw = b"".join(
        warc_record_bytes(
            record_type="response",
            payload=http_response_bytes(b),
            target_uri=f"u:{i}",
            gzip_member=member_per_record,
        )
        for i, b in enumerate(bodies)
    )
    if not member_per_record:
        raw = gzip.compress(raw)  # single member holding all records
    recs = list(iter_warc_records(raw))
    assert len(recs) == len(bodies)
    for rec, want in zip(recs, bodies):
        status, _hdrs, got = parse_http_response(rec["payload"])
        assert status == 200 and got == want


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.binary(min_size=0, max_size=120), min_size=1, max_size=4),
    st.data(),
)
def test_warc_roundtrip_random_member_splits(bodies, data):
    """The plain byte stream cut into gzip members at ARBITRARY
    positions (records spanning member boundaries) must still parse."""
    plain = b"".join(
        warc_record_bytes(
            record_type="response",
            payload=http_response_bytes(b),
            target_uri=f"u:{i}",
            gzip_member=False,
        )
        for i, b in enumerate(bodies)
    )
    n_cuts = data.draw(st.integers(min_value=0, max_value=3))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=1, max_value=max(1, len(plain) - 1)),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
    )
    pieces, prev = [], 0
    for c in cuts + [len(plain)]:
        if c > prev:
            pieces.append(plain[prev:c])
            prev = c
    raw = b"".join(gzip.compress(p) for p in pieces)
    recs = list(iter_warc_records(raw))
    assert [
        parse_http_response(r["payload"])[2] for r in recs
    ] == bodies


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=10),
    st.integers(min_value=1, max_value=10),
    st.sampled_from([1, 3]),
    st.integers(min_value=1, max_value=7),
    st.integers(min_value=0, max_value=3),
    st.sampled_from([8, 12, 16]),
    st.sampled_from([0, 3]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_lossless_jpeg_roundtrip_grid(
    h, w, nc, predictor, pt, precision, restart, seed
):
    """Decode(encode(x)) == x >> pt << pt over the full supported
    envelope: any dims, 1/3 channels, all 7 predictors, Pt 0-3,
    8/12/16-bit precision, with and without restart markers."""
    rng = np.random.default_rng(seed)
    hi = 1 << precision
    dt = np.uint8 if precision <= 8 else np.uint16
    arr = rng.integers(0, hi, size=(h, w, nc)).astype(dt)
    enc = _pixels_to_jpeg_lossless(
        arr,
        predictor=predictor,
        pt=pt,
        precision=precision,
        restart_interval=restart,
    )
    d = _decode_jpeg(enc)
    out_dt = np.uint8 if precision <= 8 else "<u2"
    got = np.frombuffer(d["payload"], dtype=out_dt).reshape(h, w, nc)
    want = (arr.astype(np.int64) >> pt << pt).astype(arr.dtype)
    assert d["width"] == w and d["height"] == h
    assert np.array_equal(got, want)


@given(
    bits=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 1)),
        min_size=1,
        max_size=3000,
    )
)
@settings(max_examples=100, deadline=None)
def test_qm_coder_roundtrip_property(bits):
    """T.81 QM arithmetic coder: any multi-context bit sequence
    round-trips, the estimation state machines converge identically on
    both sides, and the stream obeys B.1.1.5 byte stuffing."""
    from luxo_rs_spark.multimodal.media import _ArithDecoder, _ArithEncoder

    enc = _ArithEncoder()
    st_e = bytearray(8)
    for ctx, b in bits:
        enc.code(st_e, ctx, b)
    data = enc.flush()
    assert all(
        data[i + 1] == 0x00 for i in range(len(data) - 1) if data[i] == 0xFF
    )
    dec = _ArithDecoder(data, 0)
    st_d = bytearray(8)
    assert [dec.decode(st_d, ctx) for ctx, _ in bits] == [b for _, b in bits]
    assert bytes(st_e) == bytes(st_d)


@given(
    data=st.binary(min_size=0, max_size=4000),
    mcs=st.sampled_from([2, 4, 8]),
)
@settings(max_examples=100, deadline=None)
def test_gif_lzw_roundtrip_property(data, mcs):
    """GIF LZW round-trips arbitrary symbol streams across the full
    width ladder and dictionary-overflow clears."""
    from luxo_rs_spark.multimodal.media import _lzw_compress, _lzw_decompress

    syms = bytes(b % (1 << mcs) for b in data)
    assert _lzw_decompress(_lzw_compress(syms, mcs), mcs) == syms


# ---------------------------------------------------------------------------
# Archive formats (round 7): zip + ustar round-trip under hostile
# member names/payloads, both compression methods, gzip wrap.
# ---------------------------------------------------------------------------

_NAMECHARS = st.text(
    alphabet=st.characters(
        codec="utf-8",
        blacklist_characters="/\0",
        blacklist_categories=("Cs",),
    ),
    min_size=1,
    max_size=24,
)


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(_NAMECHARS, st.binary(max_size=2048), st.sampled_from([0, 8])),
        min_size=1,
        max_size=6,
    )
)
def test_zip_roundtrip_property(members):
    from luxo_rs_spark.sources.archive import build_zip, parse_zip

    # unique names (duplicate member names are legal zip but ambiguous)
    seen = set()
    uniq = []
    for n, p, m in members:
        if n in seen:
            continue
        seen.add(n)
        uniq.append((n, p, m))
    ms = parse_zip(build_zip(uniq))
    assert [(m["name"], bytes(m["payload"])) for m in ms] == [
        (n, p) for n, p, _ in uniq
    ]
    assert all(m["crc_ok"] for m in ms)
    assert [m["method"] for m in ms] == [m_ for _, _, m_ in uniq]


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(_NAMECHARS, st.binary(max_size=2048)),
        min_size=1,
        max_size=6,
    ),
    st.booleans(),
)
def test_tar_roundtrip_property(members, gz):
    from luxo_rs_spark.sources.archive import build_tar, parse_tar

    # ustar caps names at 100 utf-8 bytes; our generator stays under
    uniq = []
    seen = set()
    for n, p in members:
        if n in seen or len(n.encode()) > 100:
            continue
        seen.add(n)
        uniq.append((n, p))
    if not uniq:
        return
    ms = parse_tar(build_tar(uniq, gz=gz))
    assert [(m["name"], bytes(m["payload"]), m["chksum_ok"]) for m in ms] == [
        (n, p, True) for n, p in uniq
    ]


@settings(deadline=None, max_examples=40)
@given(
    st.integers(1, 12),
    st.integers(1, 40),
    st.integers(0, 2**32 - 1),
    st.sampled_from([0.05, 0.3, 0.5, 0.8, 0.97]),
)
def test_g4_mmr_roundtrip_property(h, w, seed, density):
    """Property: ANY bilevel bitmap round-trips through the T.6 MMR
    encoder+decoder bit-exactly — pass/vertical/horizontal mode
    selection, the full run tables, and line-end handling hold across
    arbitrary shapes and ink densities."""
    import numpy as np

    from luxo_rs_spark.multimodal.media import _g4_decode, _g4_encode

    rng = np.random.default_rng(seed)
    bm = (rng.random((h, w)) < density).astype(np.uint8)
    assert np.array_equal(_g4_decode(_g4_encode(bm), w, h), bm)


# -- VP8L (WebP lossless) property round-trip ----------------------------------


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=17),
    w=st.integers(min_value=1, max_value=23),
    mode_i=st.integers(min_value=0, max_value=7),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    n_colors=st.integers(min_value=2, max_value=200),
)
def test_vp8l_roundtrip_property(h, w, mode_i, seed, n_colors):
    """Any image, any mode, any geometry: encode->decode is identity
    (VP8L is lossless; every transform/cache/LZ77/meta path included)."""
    import numpy as np

    from luxo_rs_spark.multimodal.media import (
        _decode_payload,
        _pixels_to_webp,
    )

    modes = (
        "plain", "subtract_green", "palette", "predictor",
        "color", "cache_lz77", "meta", "stacked",
    )
    mode = modes[mode_i]
    rng = np.random.default_rng(seed)
    if mode == "palette":
        vals = rng.integers(0, 256, size=n_colors, dtype=np.uint8)
        idx = rng.integers(0, n_colors, size=(h, w))
        arr = vals[idx][:, :, None].repeat(3, axis=2)
    else:
        arr = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
    d = _decode_payload(_pixels_to_webp(arr, mode))
    assert d["width"] == w and d["height"] == h
    got = np.frombuffer(d["payload"], dtype=np.uint8).reshape(h, w, 3)
    assert np.array_equal(got, arr)


# -- length-limited Huffman (ADVICE r9: skewed distributions may exceed 15) -----


def test_vp8l_build_lengths_limits_depth_on_fibonacci_skew():
    """Fibonacci-like frequencies force plain-Huffman depths past the
    format's 15-bit cap; the builder must length-limit (not raise) and
    the result must stay a COMPLETE prefix code (Kraft equality) so
    the canonical-code decoder can always resolve a walk."""
    from fractions import Fraction

    from luxo_rs_spark.multimodal.media import _vp8l_build_lengths

    a, b = 1, 1
    freqs = {}
    for s in range(40):  # depths ~ 39 unlimited
        freqs[s] = a
        a, b = b, a + b
    lengths = _vp8l_build_lengths(freqs)
    assert set(lengths) == set(freqs)
    assert max(lengths.values()) <= 15
    assert min(lengths.values()) >= 1
    kraft = sum(Fraction(1, 2) ** ln for ln in lengths.values())
    assert kraft == 1
    # most frequent symbols keep the shortest codes
    top = max(freqs, key=lambda s: freqs[s])
    assert lengths[top] == min(lengths.values())


def test_vp8l_build_lengths_unskewed_still_optimal():
    """Distributions within the cap take the plain-Huffman path
    unchanged (optimality preserved where the cap doesn't bind)."""
    from fractions import Fraction

    from luxo_rs_spark.multimodal.media import _vp8l_build_lengths

    freqs = {0: 8, 1: 4, 2: 2, 3: 1, 4: 1}
    lengths = _vp8l_build_lengths(freqs)
    assert lengths == {0: 1, 1: 2, 2: 3, 3: 4, 4: 4}
    assert sum(Fraction(1, 2) ** ln for ln in lengths.values()) == 1


def test_vp8l_roundtrip_with_skewed_alphabet():
    """An image whose pixel histogram is Fibonacci-skewed round-trips
    through the real encoder/decoder (the length-limit in action on a
    genuine bitstream, not just the table builder)."""
    import numpy as np

    from luxo_rs_spark.multimodal.media import _decode_payload, _pixels_to_webp

    rng = np.random.default_rng(7)
    # draw 24 gray values with exponentially collapsing probabilities
    vals = np.arange(24, dtype=np.uint8)
    p = np.array([1 / (1.9**i) for i in range(24)])
    p /= p.sum()
    g = rng.choice(vals, size=(24, 32), p=p).astype(np.uint8)
    arr = np.stack([g, g, g], axis=2)
    d = _decode_payload(_pixels_to_webp(arr, "cache_lz77"))
    got = np.frombuffer(d["payload"], dtype=np.uint8).reshape(24, 32, 3)
    assert np.array_equal(got, arr)


def test_hierarchical_dct_subsampled_differential_color_roundtrip():
    """Round 10 — the last T.81 corner: hierarchical DIFFERENTIAL DCT
    frames with SUBSAMPLED chroma residuals (4:2:0 / 4:2:2), across
    Huffman/arithmetic and sequential/progressive scans, over both base
    subsamplings. Always bit-exact: the final lossless frame corrects
    whatever the decimate/replicate residual path loses."""
    import numpy as np

    from luxo_rs_spark.multimodal.media import (
        _decode_jpeg,
        _pixels_to_jpeg_hierarchical_dct,
    )

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, size=(13, 18, 3)).astype(np.uint8)
    for rs in ("420", "422"):
        for prog in (False, True):
            for ent in ("huffman", "arith"):
                b = _pixels_to_jpeg_hierarchical_dct(
                    arr, levels=3, quality=70, progressive=prog,
                    entropy=ent, subsampling="420",
                    residual_subsampling=rs,
                )
                d = _decode_jpeg(b)
                got = np.frombuffer(d["payload"], dtype=np.uint8).reshape(
                    13, 18, 3
                )
                assert np.array_equal(got, arr), (rs, prog, ent)
    # the differential frames genuinely carry subsampled factors (the
    # SOF5 component spec says 2x2 luma / 1x1 chroma), not a silent 444
    b = _pixels_to_jpeg_hierarchical_dct(
        arr, levels=2, quality=70, residual_subsampling="420"
    )
    import struct

    pos, found = 2, False
    while pos < len(b) - 4:
        assert b[pos] == 0xFF
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        size = struct.unpack_from(">H", b, pos + 2)[0]
        if marker == 0xC5:  # differential sequential DCT
            nf = b[pos + 9]
            assert nf == 3
            assert b[pos + 11] == 0x22  # component 1: 2x2
            assert b[pos + 14] == 0x11  # component 2: 1x1
            found = True
        if marker == 0xDA:
            # skip entropy data: scan to next marker
            pos += 2 + size
            while pos < len(b) - 1 and not (
                b[pos] == 0xFF and b[pos + 1] not in (0x00,)
                and not (0xD0 <= b[pos + 1] <= 0xD7)
            ):
                pos += 1
            continue
        pos += 2 + size
    assert found


def test_hierarchical_lossless_subsampled_residual_roundtrip():
    """Round 10 — subsampled LOSSLESS frames inside a hierarchy:
    intermediate SOF7 differential frames carry 4:2:0 chroma residual
    grids (zero prediction, T.81 A.2 interleave); the final 1x1 frame
    keeps the stream bit-exact; 8- and 16-bit precisions."""
    import numpy as np

    from luxo_rs_spark.multimodal.media import (
        _decode_jpeg,
        _pixels_to_jpeg_hierarchical,
    )

    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(13, 18, 3)).astype(np.uint8)
    for lv in (3, 4):
        b = _pixels_to_jpeg_hierarchical(
            arr, levels=lv, residual_subsampling="420"
        )
        got = np.frombuffer(
            _decode_jpeg(b)["payload"], dtype=np.uint8
        ).reshape(13, 18, 3)
        assert np.array_equal(got, arr)
    a16 = rng.integers(0, 65536, size=(9, 11, 3)).astype(np.uint16)
    b = _pixels_to_jpeg_hierarchical(
        a16, levels=3, residual_subsampling="420"
    )
    got = np.frombuffer(_decode_jpeg(b)["payload"], dtype="<u2").reshape(
        9, 11, 3
    )
    assert np.array_equal(got, a16)
    # the intermediate SOF7 really carries 2x2/1x1 factors on the wire
    import struct

    b = _pixels_to_jpeg_hierarchical(
        arr, levels=3, residual_subsampling="420"
    )
    pos, found = 2, False
    while pos < len(b) - 4:
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        size = struct.unpack_from(">H", b, pos + 2)[0]
        if marker == 0xC7 and b[pos + 9] == 3:
            if b[pos + 11] == 0x22 and b[pos + 14] == 0x11:
                found = True
        if marker == 0xDA:
            pos += 2 + size
            while pos < len(b) - 1 and not (
                b[pos] == 0xFF and b[pos + 1] != 0x00
                and not (0xD0 <= b[pos + 1] <= 0xD7)
            ):
                pos += 1
            continue
        pos += 2 + size
    assert found


def test_hierarchical_arith_lossless_subsampled_roundtrip():
    """Round 10 — the subsampled ARITHMETIC lossless corner: SOF15
    differential frames with 4:2:0 chroma residual grids, QM-coded
    with per-grid (Da, Db) conditioning; bit-exact at 8 and 16 bits."""
    import numpy as np

    from luxo_rs_spark.multimodal.media import (
        _decode_jpeg,
        _pixels_to_jpeg_hierarchical_arith,
    )

    rng = np.random.default_rng(13)
    arr = rng.integers(0, 256, size=(13, 18, 3)).astype(np.uint8)
    for lv in (3, 4):
        b = _pixels_to_jpeg_hierarchical_arith(
            arr, levels=lv, residual_subsampling="420"
        )
        got = np.frombuffer(
            _decode_jpeg(b)["payload"], dtype=np.uint8
        ).reshape(13, 18, 3)
        assert np.array_equal(got, arr)
    a16 = rng.integers(0, 65536, size=(9, 11, 3)).astype(np.uint16)
    b = _pixels_to_jpeg_hierarchical_arith(
        a16, levels=3, residual_subsampling="420"
    )
    got = np.frombuffer(_decode_jpeg(b)["payload"], dtype="<u2").reshape(
        9, 11, 3
    )
    assert np.array_equal(got, a16)


# -- round 10: property batteries for the foreign-format wire codecs -----------


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=64).map(lambda b: b + b"\x00" * ((-len(b)) % 4)))
def test_z85_roundtrip_property(data):
    from luxo_rs_spark.sources.deltalog import z85_decode, z85_encode

    assert z85_decode(z85_encode(data)) == data


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 40) - 1),
        min_size=0,
        max_size=300,
    ),
    st.booleans(),
)
def test_roaring_array_roundtrip_property(positions, dense):
    """Random 64-bit position sets round-trip; the `dense` flag mixes
    in a >4096-element run to force a BITMAP container."""
    from luxo_rs_spark.sources.deltalog import (
        roaring_array_deserialize,
        roaring_array_serialize,
    )

    if dense:
        positions = positions + list(range(100000, 105000))
    got = roaring_array_deserialize(roaring_array_serialize(positions))
    assert got == sorted(set(positions))


_AVRO_VAL = st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(1 << 62), max_value=(1 << 62) - 1),
        st.text(max_size=20),
        st.binary(max_size=20),
    ),
    lambda children: st.lists(children, max_size=4),
    max_leaves=8,
)


def _avro_schema_for(v):
    if v is None:
        return ["null", "long"]
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "long"
    if isinstance(v, str):
        return "string"
    if isinstance(v, bytes):
        return "bytes"
    if isinstance(v, list):
        inner = _avro_schema_for(v[0]) if v else "long"
        if inner is None:  # nested heterogeneous list
            return None
        # a list is homogeneous only if every member agrees
        return {"type": "array", "items": inner} if all(
            _avro_schema_for(x) == inner for x in v
        ) else None
    raise AssertionError(v)


@settings(max_examples=150, deadline=None)
@given(st.lists(_AVRO_VAL, min_size=1, max_size=6), st.booleans())
def test_avro_container_roundtrip_property(vals, deflate):
    """Schema-directed avro encode/decode round-trips arbitrary
    records (fields typed per value, heterogeneous lists skipped),
    null and deflate codecs."""
    from luxo_rs_spark.sources.avro_io import read_avro, write_avro

    fields, rec = [], {}
    for i, v in enumerate(vals):
        sch = _avro_schema_for(v)
        if sch is None:
            continue  # heterogeneous list: not schema-expressible
        fields.append({"name": f"f{i}", "type": sch})
        rec[f"f{i}"] = v
    if not fields:
        return
    schema = {"type": "record", "name": "p", "fields": fields}
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".avro") as f:
        write_avro(
            f.name, schema, [rec, rec],
            codec="deflate" if deflate else "null",
        )
        _, got = read_avro(f.name)
    assert got == [rec, rec]


def test_subsampled_lossless_restart_markers_roundtrip():
    """Round 10 — restarts in SUBSAMPLED lossless scans (the last
    piece of the r9 'in-hierarchy/arithmetic/restart subsampled
    lossless' trio): byte-aligned RSTn every Ri MCUs, per-component
    default-prediction reset, encoder/decoder convention pinned by the
    round trip; arithmetic sampled scans still raise on restarts."""
    import numpy as np
    import pytest as _pt

    from luxo_rs_spark.multimodal.media import (
        _decode_jpeg,
        _pixels_to_jpeg_lossless,
    )

    rng = np.random.default_rng(17)
    arr = rng.integers(0, 256, size=(12, 17, 3)).astype(np.uint8)
    sampling = [(2, 2), (1, 1), (1, 1)]
    for ri in (1, 3, 7):
        b = _pixels_to_jpeg_lossless(
            arr, predictor=4, restart_interval=ri, sampling=sampling
        )
        assert b.count(b"\xff\xd0") + sum(
            b.count(bytes([0xFF, 0xD0 + i])) for i in range(1, 8)
        ) > 0  # restarts genuinely on the wire
        got = np.frombuffer(
            _decode_jpeg(b)["payload"], dtype=np.uint8
        ).reshape(12, 17, 3)
        exp = np.zeros_like(arr)
        for c, (hi, vi) in enumerate(sampling):
            sy, sx = 2 // vi, 2 // hi
            sub = arr[::sy, ::sx, c]
            exp[:, :, c] = np.repeat(
                np.repeat(sub, sy, axis=0), sx, axis=1
            )[:12, :17]
        assert np.array_equal(got, exp)
