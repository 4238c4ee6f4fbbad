"""Multimodal plumbing: deterministic payloads, exact byte histograms,
frame-sampling shape, and the decode stub's contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_showcase_spark.catalog import table
from etl_showcase_spark.operators.multimodal import (
    attach_media_columns,
    decode_media,
    extract_byte_features,
    sample_frames,
)

from .conftest import SF_SMOKE


def test_features_match_numpy_reference(spark):
    d = attach_media_columns(table(spark, SF_SMOKE, "documents")).limit(20)
    rows = {r.doc_id: r.text for r in d.select("doc_id", "text").collect()}
    feats = {r.doc_id: (r.features, r.n_bytes) for r in extract_byte_features(d).collect()}
    assert feats.keys() == rows.keys()
    for doc_id, text in rows.items():
        arr = np.frombuffer(text.encode(), dtype=np.uint8)
        expected = np.bincount(arr >> 4, minlength=16) / len(arr)
        got, n_bytes = feats[doc_id]
        assert n_bytes == len(arr)
        assert np.allclose(got, expected, atol=0)  # bit-exact


def test_frame_sample_covers_payload(spark):
    d = attach_media_columns(table(spark, SF_SMOKE, "documents"))
    frames = sample_frames(d, every_n_bytes=64)
    per_doc = (
        frames.groupBy("doc_id")
        .agg(
            F.sum(F.octet_length("frame_bytes")).alias("total"),
            F.count(F.lit(1)).alias("n_frames"),
        )
        .join(d.select("doc_id", F.length("text").alias("n")), "doc_id")
    )
    bad = per_doc.filter(
        (F.col("total") != F.col("n"))
        | (F.col("n_frames") != F.ceil(F.col("n") / 64))
    ).count()
    assert bad == 0


def test_decode_stub_contract():
    decode_media("raw")  # supported fake codec: no-op
    decode_media("jpeg")  # real from-spec decoder since round 13
    with pytest.raises(NotImplementedError):
        decode_media("mp4")


def test_decode_and_resize(spark):
    from etl_showcase_spark.catalog import table
    from etl_showcase_spark.operators.multimodal import (
        attach_media_columns,
        decode_media_batch,
        resize_media,
    )
    from .conftest import SF_SMOKE

    d = attach_media_columns(table(spark, SF_SMOKE, "documents")).limit(50)
    dec = decode_media_batch(d)
    row = dec.orderBy("doc_id").first()
    assert row.n_samples == len(row.samples) > 0
    assert all(0.0 <= s <= 1.0 for s in row.samples)

    rz = resize_media(d, out_size=16)
    rows = rz.collect()
    assert all(len(r.resized) == 16 for r in rows)
    # nearest-neighbor: resized values are drawn from the original bytes
    src = {r.doc_id: r.samples for r in dec.collect()}
    for r in rows:
        assert all(any(abs(v - s) < 1e-12 for s in src[r.doc_id]) for v in r.resized)


def test_decode_stub_raises_for_unknown_codec(spark):
    import pytest
    from pyspark.sql import functions as F
    from etl_showcase_spark.catalog import table
    from etl_showcase_spark.operators.multimodal import (
        attach_media_columns,
        decode_media_batch,
    )
    from .conftest import SF_SMOKE

    d = attach_media_columns(table(spark, SF_SMOKE, "documents")).limit(5)
    bad = d.withColumn(
        "media_meta",
        F.struct(
            F.lit("mp4").alias("format"),
            F.col("media_meta.n_bytes").alias("n_bytes"),
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
        ),
    )
    with pytest.raises(Exception, match="NotImplementedError|decode for format"):
        decode_media_batch(bad).collect()


def _reference_ppm_decode_resize(buf: bytes, out_size: int):
    """Independent pure-Python PPM reference (no numpy, no shared code
    with the operator): parse header, gather nearest-neighbor pixels
    with plain loops. Deliberately dumb — its only virtue is that it
    cannot share a bug with the vectorized implementation."""
    assert buf[:2] == b"P6"
    pos, tokens = 2, []
    while len(tokens) < 3:
        while chr(buf[pos]).isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            pos = buf.index(b"\n", pos)
            continue
        start = pos
        while not chr(buf[pos]).isspace():
            pos += 1
        tokens.append(int(buf[start:pos]))
    w, h, maxval = tokens
    assert maxval == 255
    pix = buf[pos + 1 :]
    assert len(pix) == w * h * 3
    total = 0
    for rr in range(out_size):
        sr = min(rr * h // out_size, h - 1)
        for cc in range(out_size):
            sc = min(cc * w // out_size, w - 1)
            base = (sr * w + sc) * 3
            total += pix[base] + pix[base + 1] + pix[base + 2]
    return w, h, total


def test_ppm_decode_resize_matches_reference(spark):
    from etl_showcase_spark.operators.multimodal import (
        attach_ppm_media,
        decode_resize_ppm,
    )

    d = attach_ppm_media(table(spark, SF_SMOKE, "documents")).limit(25)
    payloads = {r.doc_id: bytes(r.media) for r in d.collect()}
    got = {r.doc_id: r for r in decode_resize_ppm(d, out_size=16).collect()}
    assert got.keys() == payloads.keys()
    for doc_id, buf in payloads.items():
        w, h, ref_sum = _reference_ppm_decode_resize(buf, 16)
        r = got[doc_id]
        assert (r.width, r.height) == (w, h)
        assert r.n_samples == w * h * 3
        assert r.resized_dim == 16 * 16 * 3
        assert r.pixel_sum == ref_sum
        assert r.resized_sum == ref_sum / 255.0


def test_ppm_decode_rejects_corrupt_payloads():
    import pytest as _pytest

    from etl_showcase_spark.operators.multimodal import _parse_ppm

    w, h = 4, 3
    good = b"P6\n# c\n4 3\n255\n" + bytes(range(w * h * 3))
    pw, ph, pix = _parse_ppm(good)
    assert (pw, ph) == (w, h) and pix.shape == (h, w, 3)
    with _pytest.raises(ValueError, match="not a P6"):
        _parse_ppm(b"P5\n4 3\n255\n" + bytes(36))
    with _pytest.raises(ValueError, match="truncated"):
        _parse_ppm(b"P6\n4 3\n255\n" + bytes(10))
    with _pytest.raises(ValueError, match="maxval"):
        _parse_ppm(b"P6\n4 3\n65535\n" + bytes(72))


def test_grouped_trend_matches_numpy(spark):
    import numpy as np
    from etl_showcase_spark.catalog import table
    from etl_showcase_spark.operators.textops import grouped_trend
    from .conftest import SF_SMOKE

    ev = table(spark, SF_SMOKE, "events")
    got = {r.key: r for r in grouped_trend(ev, "user_id", "ts", "value").collect()}
    sample = ev.filter("user_id % 37 = 0").toPandas()
    for uid, grp in sample.groupby("user_id"):
        x = grp["ts"].astype("datetime64[ns]").astype("int64").to_numpy() / 1e9
        y = grp["value"].to_numpy(dtype="float64")
        if len(x) < 2 or np.ptp(x) == 0:
            continue
        xm, ym = x.mean(), y.mean()
        slope = ((x - xm) * (y - ym)).sum() / ((x - xm) ** 2).sum() * 3600.0
        assert got[uid].n_obs == len(x)
        assert abs(got[uid].slope_per_hour - slope) < 1e-9 * max(1.0, abs(slope))


def test_approx_count_distinct_within_rsd(spark):
    from pyspark.sql import functions as F
    from etl_showcase_spark.catalog import table
    from .conftest import SF_SMOKE

    o = table(spark, SF_SMOKE, "orders")
    exact = o.select(F.countDistinct("o_custkey")).first()[0]
    approx = o.select(F.approx_count_distinct("o_custkey", rsd=0.05)).first()[0]
    assert abs(approx - exact) / exact < 0.15  # 3 sigma of rsd=0.05


def test_wav_payloads_open_with_stdlib_wave(spark):
    # the synthesized payloads are REAL WAVE files: python's stdlib
    # wave module (an independent implementation of the spec) must
    # open them and agree on rate/width/frames with our own parser
    import io
    import wave

    import numpy as np

    from etl_showcase_spark.catalog import table
    from etl_showcase_spark.operators.multimodal import _parse_wav, attach_wav_media

    from .conftest import SF_SMOKE

    d = attach_wav_media(table(spark, SF_SMOKE, "documents")).limit(20).collect()
    assert len(d) == 20
    for row in d:
        buf = bytes(row["media"])
        with wave.open(io.BytesIO(buf)) as w:
            assert w.getframerate() == 8000
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
            frames = w.readframes(w.getnframes())
        sr, samples = _parse_wav(buf)
        assert sr == 8000
        assert frames == samples.astype("<i2").tobytes()
        assert len(samples) == row["media_meta"]["n_samples"]


def test_wav_parser_rejects_malformed():
    import pytest as _pytest

    from etl_showcase_spark.operators.multimodal import _parse_wav

    with _pytest.raises(ValueError):
        _parse_wav(b"RIFX" + b"\x00" * 60)  # wrong magic
    with _pytest.raises(ValueError):
        _parse_wav(b"RIFF\x00\x00\x00\x00WAVEjunk" + b"\x00" * 40)  # no fmt
    # truncated data chunk
    from etl_showcase_spark.operators.multimodal import attach_wav_media  # noqa: F401
    import struct

    hdr = (
        b"RIFF" + struct.pack("<I", 36 + 10) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 10) + b"\x00" * 4
    )
    with _pytest.raises(ValueError):
        _parse_wav(hdr)


def test_map_in_arrow_twin_matches_map_in_pandas(spark):
    # the Arrow-native API must produce the identical feature frame
    from etl_showcase_spark.catalog import table
    from etl_showcase_spark.operators.multimodal import (
        attach_media_columns,
        extract_byte_features,
        extract_byte_features_arrow,
    )

    from .conftest import SF_SMOKE

    d = attach_media_columns(table(spark, SF_SMOKE, "documents"))
    a = extract_byte_features(d).toPandas()
    b = extract_byte_features_arrow(d).toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert (a["doc_id"] == b["doc_id"]).all()
    assert (a["n_bytes"] == b["n_bytes"]).all()
    for fa, fb in zip(a["features"], b["features"]):
        assert list(fa) == list(fb)


def test_png_roundtrip_and_filter_coverage():
    """Encoder and decoder are independent implementations of RFC 2083;
    agreeing on random pixels across shapes (including heights > 4,
    which exercise all five scanline filters) is the codec proof."""
    import numpy as np

    from etl_showcase_spark.operators.multimodal import _encode_png, _parse_png

    rng = np.random.RandomState(11)
    for h, w in [(1, 1), (3, 2), (5, 8), (10, 16), (7, 9)]:
        pix = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        buf = _encode_png(pix)
        assert buf[:8] == b"\x89PNG\r\n\x1a\n"
        w2, h2, out = _parse_png(buf)
        assert (w2, h2) == (w, h)
        assert (out == pix).all()
    # multi-IDAT is genuinely exercised: 10x16 deflate exceeds one chunk
    big = _encode_png(rng.randint(0, 256, (10, 16, 3), dtype=np.uint8))
    assert big.count(b"IDAT") >= 2


def test_png_decoder_rejects_corruption():
    import numpy as np
    import pytest

    from etl_showcase_spark.operators.multimodal import _encode_png, _parse_png

    pix = np.arange(6 * 8 * 3, dtype=np.uint8).reshape(6, 8, 3)
    good = _encode_png(pix)
    with pytest.raises(ValueError):  # bad signature
        _parse_png(b"NOPE" + good[4:])
    flipped = bytearray(good)
    flipped[30] ^= 0xFF  # inside IHDR body -> CRC mismatch
    with pytest.raises(ValueError):
        _parse_png(bytes(flipped))
    with pytest.raises(ValueError):  # truncated: IEND never arrives
        _parse_png(good[:-12])


def test_png_decode_resize_matches_ppm_path(spark):
    """Same doc_id-derived images through two containers (netpbm vs
    zlib-deflate PNG) must decode to identical feature rows."""
    from etl_showcase_spark.operators.multimodal import (
        attach_png_media,
        attach_ppm_media,
        decode_resize_png,
        decode_resize_ppm,
    )

    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(40)
    a = {
        tuple(r)
        for r in decode_resize_png(attach_png_media(d), out_size=32).collect()
    }
    b = {
        tuple(r)
        for r in decode_resize_ppm(attach_ppm_media(d), out_size=32).collect()
    }
    assert a == b and len(a) == 40


# ---------------------------------------------------------------------------
# JPEG (round 13): the entropy-codec pair, tested at three levels —
# exact roundtrip on the oracle payload family, bit-equality with an
# independent direct-cosine reference pipeline on general images (AC
# run-length path), and loud failure on unsupported profiles.
# ---------------------------------------------------------------------------


def _jpeg_ref_pipeline(img):
    """Independent reference: direct O(64^2) cosine double-sum FDCT and
    IDCT in plain loops (the T.81 A.3.3 formulas verbatim), the same
    integer-exact color transforms, no code shared with the codec's
    separable matrix implementation. Its only virtue is that it cannot
    share a bug with the vectorized encoder/decoder."""
    import numpy as np

    from etl_showcase_spark.operators.multimodal import (
        _JPEG_Q_CHROMA,
        _JPEG_Q_LUMA,
    )

    h, w, _ = img.shape
    r, g, b = (img[:, :, i].astype(np.int64) for i in range(3))
    y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
    cb = 128 + ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16)
    cr = 128 + ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16)
    planes = [np.clip(p, 0, 255).astype(np.float64) for p in (y, cb, cr)]
    qts = [
        np.array(_JPEG_Q_LUMA, dtype=np.float64).reshape(8, 8),
        np.array(_JPEG_Q_CHROMA, dtype=np.float64).reshape(8, 8),
        np.array(_JPEG_Q_CHROMA, dtype=np.float64).reshape(8, 8),
    ]

    def c(u):
        return 1 / np.sqrt(2) if u == 0 else 1.0

    outp = []
    for ci, p in enumerate(planes):
        o = np.zeros_like(p)
        for by in range(h // 8):
            for bx in range(w // 8):
                s = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                S = np.zeros((8, 8))
                for u in range(8):
                    for v in range(8):
                        acc = 0.0
                        for yy in range(8):
                            for xx in range(8):
                                acc += (
                                    s[yy, xx]
                                    * np.cos((2 * xx + 1) * v * np.pi / 16)
                                    * np.cos((2 * yy + 1) * u * np.pi / 16)
                                )
                        S[u, v] = 0.25 * c(u) * c(v) * acc
                q = np.sign(S / qts[ci]) * np.floor(np.abs(S / qts[ci]) + 0.5)
                R = q * qts[ci]
                blk = np.zeros((8, 8))
                for yy in range(8):
                    for xx in range(8):
                        acc = 0.0
                        for u in range(8):
                            for v in range(8):
                                acc += (
                                    c(u)
                                    * c(v)
                                    * R[u, v]
                                    * np.cos((2 * xx + 1) * v * np.pi / 16)
                                    * np.cos((2 * yy + 1) * u * np.pi / 16)
                                )
                        blk[yy, xx] = acc / 4.0 + 128.0
                o[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = blk
        outp.append(o)
    yp, cbp, crp = outp
    rr = yp + 1.402 * (crp - 128)
    gg = yp - 0.344136 * (cbp - 128) - 0.714136 * (crp - 128)
    bb = yp + 1.772 * (cbp - 128)
    import numpy as np  # noqa: F811

    return np.stack(
        [np.clip(np.floor(ch + 0.5), 0, 255) for ch in (rr, gg, bb)], -1
    ).astype("uint8")


def test_jpeg_constant_block_roundtrip_exact():
    # the oracle payload family: constant-gray 8x8 blocks with the DC
    # quant step pinned to 1 must survive the LOSSY codec EXACTLY —
    # this is the property the registered query's hash check rests on
    import numpy as np

    from etl_showcase_spark.operators.multimodal import _encode_jpeg, _parse_jpeg

    rng = np.random.RandomState(13)
    for bw, bh in [(1, 1), (3, 2), (2, 1)]:
        grid = rng.randint(0, 128, size=(bh, bw)).astype(np.uint8)
        gray = np.kron(grid, np.ones((8, 8), dtype=np.uint8))
        img = np.stack([gray] * 3, axis=-1)
        buf = _encode_jpeg(img)
        assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
        assert b"JFIF\x00" in buf[:32]
        w, h, dec = _parse_jpeg(buf)
        assert (w, h) == (bw * 8, bh * 8)
        assert np.array_equal(dec, img)


def test_jpeg_matches_independent_reference_on_general_images():
    # general images make every AC machinery real: nonzero AC
    # coefficients, zero runs, ZRL, EOB placement, magnitude
    # categories, stuffed 0xFF bytes. The full encode -> bitstream ->
    # decode path must be BIT-IDENTICAL to the independent direct-
    # cosine reference of dequant(quant(dct)) — i.e. the bitstream is
    # a lossless carrier of the quantized coefficients and the IDCT /
    # color convert agree to the final uint8
    import numpy as np

    from etl_showcase_spark.operators.multimodal import _encode_jpeg, _parse_jpeg

    from etl_showcase_spark.operators.multimodal import _JPEG_Q_CHROMA, _JPEG_Q_LUMA

    def boundary_distance(img):
        # min distance of any |DCT coeff|/q to a round-half-away
        # boundary: bit-equality between two float FDCT spellings is
        # only meaningful when no coefficient sits ON a quantization
        # boundary (there a 1e-12 FDCT difference legally flips a whole
        # quant step). The seeds below are fixed AND guarded, so the
        # comparison can never silently become vacuous.
        r, g, b = (img[:, :, i].astype(np.int64) for i in range(3))
        y = (19595 * r + 38470 * g + 7471 * b + 32768) >> 16
        cb = 128 + ((-11059 * r - 21709 * g + 32768 * b + 32768) >> 16)
        cr = 128 + ((32768 * r - 27439 * g - 5329 * b + 32768) >> 16)
        planes = [np.clip(p, 0, 255).astype(np.float64) for p in (y, cb, cr)]
        qts = [np.array(_JPEG_Q_LUMA, float).reshape(8, 8)] + [
            np.array(_JPEG_Q_CHROMA, float).reshape(8, 8)
        ] * 2
        u = np.arange(8).reshape(8, 1)
        x = np.arange(8).reshape(1, 8)
        m = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
        m[0, :] *= 1 / np.sqrt(2)
        h, w, _ = img.shape
        dmin = 1.0
        for ci, p in enumerate(planes):
            for by in range(h // 8):
                for bx in range(w // 8):
                    s = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                    q = np.abs((m @ s @ m.T) / qts[ci]) + 0.5
                    dmin = min(dmin, float(np.min(np.abs(q - np.round(q)))))
        return dmin

    stuffed = False
    for seed in (1, 3, 5):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, size=(8, 16, 3)).astype(np.uint8)
        assert boundary_distance(img) > 1e-6, f"seed {seed} hits a quant boundary"
        buf = _encode_jpeg(img)
        stuffed = stuffed or (b"\xff\x00" in buf)
        _, _, dec = _parse_jpeg(buf)
        ref = _jpeg_ref_pipeline(img)
        assert np.array_equal(dec, ref), f"seed {seed}: codec diverges from reference"
    assert stuffed, "no 0xFF byte ever stuffed — stuffing path untested"


def test_jpeg_unsupported_profiles_fail_loudly():
    import numpy as np
    import pytest

    from etl_showcase_spark.operators.multimodal import _encode_jpeg, _parse_jpeg

    img = np.full((8, 8, 3), 77, dtype=np.uint8)
    buf = bytearray(_encode_jpeg(img))
    # progressive SOF2 instead of baseline SOF0
    sof = buf.find(b"\xff\xc0")
    buf2 = bytes(buf[:sof]) + b"\xff\xc2" + bytes(buf[sof + 2 :])
    with pytest.raises(ValueError, match="baseline"):
        _parse_jpeg(buf2)
    # truncated entropy segment
    with pytest.raises(ValueError):
        _parse_jpeg(bytes(buf[: len(buf) // 2]))
    # dimensions not multiples of 8 rejected at the encoder
    with pytest.raises(ValueError):
        _encode_jpeg(np.zeros((9, 8, 3), dtype=np.uint8))


def test_jpeg_decode_query_matches_closed_form(spark):
    # the Spark-side path end-to-end: attach (encode) -> decode ->
    # resize over real documents must equal the closed form the SQL
    # oracle replays (block value = text byte at block index)
    from etl_showcase_spark.catalog import table
    from etl_showcase_spark.operators.multimodal import (
        attach_jpeg_media,
        decode_resize_jpeg,
    )
    from .conftest import SF_SMOKE

    docs = table(spark, SF_SMOKE, "documents").limit(60)
    got = (
        decode_resize_jpeg(attach_jpeg_media(docs), out_size=16)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    src = docs.select("doc_id", "text").toPandas().set_index("doc_id").sort_index()
    for did, row in got.iterrows():
        body = (src.loc[did, "text"] or "").encode("utf-8")
        w, h = int(row["width"]), int(row["height"])
        assert (w, h) == (8 * (1 + did % 3), 8 * (1 + did % 2))
        expect = 0
        for k in range(768):
            i, j = k // 48, (k // 3) % 16
            ri = min(i * h // 16, h - 1)
            ci = min(j * w // 16, w - 1)
            blk = (ri // 8) * (w // 8) + (ci // 8)
            expect += body[blk % len(body)] if body else 0
        assert int(row["pixel_sum"]) == expect, did
