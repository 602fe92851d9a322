"""Pure-Python P6 PPM decode tier (round-7: the first REAL pixel decode
value-certified in this container — operators/multimodal.decode_ppm and
the no-dependency arm of extract_features(real_decode=True))."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from pubmed_central_semantic_search_spark.operators.multimodal import (
    decode_image_stats,
    decode_ppm,
    extract_features,
)


def _ppm(w, h, px_bytes, header_extra=b""):
    return b"P6\n" + header_extra + f"{w} {h}\n255\n".encode() + px_bytes


def test_decode_ppm_known_pixels():
    px = bytes(range(2 * 2 * 3))  # 2x2 RGB, values 0..11
    w, h, arr = decode_ppm(_ppm(2, 2, px))
    assert (w, h) == (2, 2)
    assert arr.shape == (2, 2, 3)
    assert arr.tolist() == [[[0, 1, 2], [3, 4, 5]], [[6, 7, 8], [9, 10, 11]]]


def test_decode_ppm_header_comment_and_errors():
    px = bytes(6)
    w, h, arr = decode_ppm(_ppm(2, 1, px, header_extra=b"# a comment\n"))
    assert (w, h) == (2, 1) and arr.shape == (1, 2, 3)
    with pytest.raises(ValueError, match="not a binary P6"):
        decode_ppm(b"P3\n1 1\n255\n000")
    with pytest.raises(ValueError, match="truncated pixel data"):
        decode_ppm(b"P6\n2 2\n255\n" + bytes(5))
    with pytest.raises(ValueError, match="unsupported maxval"):
        decode_ppm(b"P6\n1 1\n65535\n" + bytes(6))


def test_decode_image_stats_values_and_error_isolation(spark):
    blob = _ppm(3, 2, bytes(range(18)))
    media = spark.createDataFrame(
        [("ok", blob), ("bad", b"JFIF-not-a-ppm")],
        "media_id string, content binary",
    )
    rows = {r["media_id"]: r for r in decode_image_stats(media).collect()}
    ok = rows["ok"]
    assert (ok["width"], ok["height"], ok["n_bytes"]) == (3, 2, len(blob))
    # channel sums of 0..17: r = 0+3+..+15, g = 1+4+..+16, b = 2+5+..+17
    assert (ok["sum_r"], ok["sum_g"], ok["sum_b"]) == (45, 51, 57)
    assert ok["error"] is None
    bad = rows["bad"]
    assert bad["width"] is None and "not a binary P6" in bad["error"]


def test_extract_features_real_decode_ppm_tier(spark):
    """Without PIL, real_decode=True routes images through the PPM tier:
    the feature is the L2-normalized center-sampled grid — verified
    against a hand-computed expectation on a constant-color image; a
    non-PPM image and a non-image modality land in the error column."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: the PPM tier is shadowed by the PIL arm")
    except ImportError:
        pass
    # 4x4 image, every pixel (100, 200, 50)
    px = bytes([100, 200, 50] * 16)
    media = spark.createDataFrame(
        [
            ("img", "image", _ppm(4, 4, px)),
            ("notppm", "image", b"\x89PNG fake"),
            ("aud", "audio", b"RIFF"),
        ],
        "media_id string, modality string, content binary",
    )
    rows = {
        r["media_id"]: r
        for r in extract_features(media, dim=12, real_decode=True).collect()
    }
    img = rows["img"]
    assert img["error"] is None
    want = np.array([100, 200, 50] * 4, dtype=np.float64) / 255.0
    want = want / np.linalg.norm(want)
    got = np.array(img["feature"], dtype=np.float64)
    assert got.shape == (12,)
    assert np.allclose(got, want, atol=1e-6)
    assert "not a binary P6" in rows["notppm"]["error"]
    assert "real decode not implemented" in rows["aud"]["error"]


def test_resize_images_ppm_tier_roundtrip(spark):
    """Without PIL, resize_images(real_decode=True) routes through the
    pure-Python PPM tier: nearest-neighbor center sampling, P6 re-encode
    that round-trips through decode_ppm with exact expected pixels."""
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: the PPM tier is shadowed by the PIL arm")
    except ImportError:
        pass
    from pubmed_central_semantic_search_spark.operators.multimodal import (
        resize_images,
    )

    # 4x2 image: left half red, right half green
    px = bytes([255, 0, 0] * 2 + [0, 255, 0] * 2) * 2
    media = spark.createDataFrame(
        [("img", "image", _ppm(4, 2, px)), ("aud", "audio", b"RIFF")],
        "media_id string, modality string, content binary",
    )
    rows = {
        r["media_id"]: r
        for r in resize_images(media, width=2, height=1, real_decode=True).collect()
    }
    img = rows["img"]
    assert img["error"] is None
    assert img["n_bytes_in"] == len(_ppm(4, 2, px))
    w, h, out = decode_ppm(bytes(img["content"]))
    assert (w, h) == (2, 1)
    # center samples: row floor(0.5*2/1)=1; cols floor(0.5*4/2)=1 (red),
    # floor(1.5*4/2)=3 (green)
    assert out.tolist() == [[[255, 0, 0], [0, 255, 0]]]
    assert "real resize not implemented" in rows["aud"]["error"]


def test_pdf_lite_tier_extracts_generated_pdf(spark):
    """Round-7 S6 closure (the decode_ppm pattern): a REAL PDF parse is
    value-tested in-container — generate a minimal uncompressed PDF,
    extract through the no-dependency lite tier (escapes, TJ arrays,
    page count), with per-row error isolation for out-of-subset blobs."""
    from pubmed_central_semantic_search_spark.sources.pdf import (
        extract_pdf_text_lite,
        make_minimal_pdf,
        pdf_textlite,
    )

    lines = ["Hello (spark) world", "back\\slash", "tab\tand) paren"]
    blob = make_minimal_pdf(lines)
    # driver-side parser contract
    n_pages, text = pdf_textlite(blob)
    assert n_pages == 1 and text == "\n".join(lines)
    # TJ-array form parses too
    tj = blob.replace(
        b"(Hello \\(spark\\) world) Tj", b"[(Hello ) (\\(spark\\) world)] TJ"
    )
    assert pdf_textlite(tj)[1].startswith("Hello \n(spark) world")
    # Spark stage: same schema + error isolation
    df = spark.createDataFrame(
        [
            ("a.pdf", blob),
            ("flate.pdf", make_minimal_pdf(lines, compress=True)),
            ("corrupt.pdf", b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode "
             b"/Length 7 >>\nstream\ngarbage\nendstream\nendobj\n%%EOF"),
            ("lzw.pdf", b"%PDF-1.4\n1 0 obj\n<< /Filter /LZWDecode "
             b"/Length 4 >>\nstream\nabcd\nendstream\nendobj\n%%EOF"),
            ("not.pdf", b"GIF89a"),
        ],
        "path string, content binary",
    )
    rows = {r["path"]: r for r in extract_pdf_text_lite(df).collect()}
    assert rows["a.pdf"]["error"] is None
    assert rows["a.pdf"]["text"] == "\n".join(lines)
    assert rows["a.pdf"]["n_pages"] == 1
    # round-8: FlateDecode streams REALLY inflate (stdlib zlib) — the
    # overwhelmingly common real-PDF case is now in the lite subset
    assert rows["flate.pdf"]["error"] is None
    assert rows["flate.pdf"]["text"] == "\n".join(lines)
    assert "failed to inflate" in rows["corrupt.pdf"]["error"]
    assert "unsupported stream filter" in rows["lzw.pdf"]["error"]
    assert "not a PDF" in rows["not.pdf"]["error"]


def test_pdf_lite_matches_pypdf_when_available(spark):
    """The gated twin: with pypdf installed, the generated minimal PDF
    must extract the same text through BOTH tiers (modulo pypdf's
    layout-driven line joining)."""
    pytest.importorskip("pypdf")
    from pubmed_central_semantic_search_spark.sources.pdf import (
        make_minimal_pdf,
        pdf_textlite,
    )
    import io

    from pypdf import PdfReader

    lines = ["alpha", "beta (x)"]
    for compress in (False, True):  # round-8: the FlateDecode tier too
        blob = make_minimal_pdf(lines, compress=compress)
        got_pypdf = PdfReader(io.BytesIO(blob)).pages[0].extract_text()
        _, got_lite = pdf_textlite(blob)
        assert got_lite.split("\n") == lines
        assert "alpha" in got_pypdf and "beta (x)" in got_pypdf


def test_pdf_lite_octal_escapes():
    """Review find: bytes.isdigit accepts 8/9, so the valid one-digit
    octal escape \\1 followed by a literal '8' crashed int(..., 8) and
    errored the whole row. Octal scanning now consumes 0-7 only."""
    from pubmed_central_semantic_search_spark.sources.pdf import pdf_textlite

    blob = (b"%PDF-1.4\n1 0 obj\n<< /Type /Page >>\nendobj\n"
            b"BT (a\\18b \\101 \\0418) Tj ET\n%%EOF")
    n_pages, text = pdf_textlite(blob)
    assert n_pages == 1
    # \1 -> \x01 then literal '8'; \101 -> 'A'; \041 -> '!' then '8'
    assert text == "a\x018b A !8"


def test_pdf_lite_scanner_nested_parens_and_bracket_in_tj():
    """Round-8 ADVICE: the regex tier silently DROPPED (a) strings with
    unescaped balanced nested parens ('((nested)) Tj' is legal — the
    spec says balanced pairs need no escaping) and (b) TJ arrays whose
    strings contain an unescaped ']'. The scanner parses both."""
    from pubmed_central_semantic_search_spark.sources.pdf import pdf_textlite

    blob = (b"%PDF-1.4\n1 0 obj\n<< /Type /Page >>\nendobj\n"
            b"BT ((nested) parens) Tj [ (a]b) -120 (c) ] TJ ET\n%%EOF")
    n_pages, text = pdf_textlite(blob)
    assert n_pages == 1
    assert text == "(nested) parens\na]b\nc"


def test_pdf_lite_out_of_subset_shapes_raise_by_name(spark):
    """Round-8 ADVICE: out-of-subset show shapes must land in the error
    column BY NAME, never as wrong-empty text — hex-string operands and
    the '/\" move-and-show operators; kerning-only TJ arrays are legal
    and show nothing."""
    from pubmed_central_semantic_search_spark.sources.pdf import (
        extract_pdf_text_lite,
        pdf_textlite,
    )

    head = b"%PDF-1.4\n1 0 obj\n<< /Type /Page >>\nendobj\n"
    df = spark.createDataFrame(
        [
            ("hex.pdf", head + b"BT <48656C6C6F> Tj ET\n%%EOF"),
            ("apos.pdf", head + b"BT (x) ' ET\n%%EOF"),
            ("kern.pdf", head + b"BT [ -120 ] TJ (ok) Tj ET\n%%EOF"),
        ],
        "path string, content binary",
    )
    rows = {r["path"]: r for r in extract_pdf_text_lite(df).collect()}
    assert "hex-string" in rows["hex.pdf"]["error"]
    assert "show operator" in rows["apos.pdf"]["error"]
    assert rows["kern.pdf"]["error"] is None
    assert rows["kern.pdf"]["text"] == "ok"
    # a Tj with no string operand is malformed, not silently empty
    try:
        pdf_textlite(head + b"BT Tj ET\n%%EOF")
        raise AssertionError("expected ValueError")
    except ValueError as ex:
        assert "no literal-string operand" in str(ex)


def test_wav_decode_roundtrip_and_subset_errors(spark):
    """Round-8 S6-style closure for AUDIO (the decode_ppm pattern): a
    REAL PCM decode is value-tested in-container — generate canonical
    RIFF/WAVE PCM-16, decode through the no-dependency tier, with the
    stdlib `wave` module as the always-available spec twin; out-of-subset
    shapes land in the error column by name."""
    import struct

    import numpy as np

    from pubmed_central_semantic_search_spark.operators.multimodal import (
        decode_audio_stats,
        decode_wav,
        make_wav_pcm16,
    )

    stereo = np.arange(-6, 6).reshape(6, 2)
    blob = make_wav_pcm16(stereo, 8000)
    rate, ch, frames = decode_wav(blob)
    assert (rate, ch) == (8000, 2) and (frames == stereo).all()
    # stdlib wave agrees on the container metadata AND the samples
    import io
    import wave

    w = wave.open(io.BytesIO(blob))
    assert (w.getframerate(), w.getnchannels(), w.getnframes()) == (8000, 2, 6)
    assert np.frombuffer(w.readframes(6), dtype="<i2").reshape(6, 2).tolist() \
        == stereo.tolist()
    # mono 1-D input
    mono = make_wav_pcm16([1, -2, 3], 16000)
    rate, ch, frames = decode_wav(mono)
    assert (rate, ch, frames.ravel().tolist()) == (16000, 1, [1, -2, 3])
    # out-of-subset: float format (3) and 8-bit raise by name
    fl = bytearray(blob)
    fl[20:22] = struct.pack("<H", 3)
    b8 = bytearray(blob)
    b8[34:36] = struct.pack("<H", 8)
    df = spark.createDataFrame(
        [
            ("ok", bytes(blob)),
            ("float", bytes(fl)),
            ("8bit", bytes(b8)),
            ("junk", b"RIFFxxxxNOPE"),
        ],
        "media_id string, content binary",
    )
    rows = {r["media_id"]: r for r in decode_audio_stats(df).collect()}
    ok = rows["ok"]
    assert (ok["sample_rate"], ok["n_channels"], ok["n_frames"]) == (8000, 2, 6)
    assert ok["sum_c0"] == int(stereo[:, 0].sum())
    assert ok["sum_c1"] == int(stereo[:, 1].sum())
    assert "non-PCM" in rows["float"]["error"]
    assert "16-bit" in rows["8bit"]["error"]
    assert "RIFF/WAVE" in rows["junk"]["error"]


def test_y4m_decode_roundtrip_and_subset_errors(spark):
    """Round-8: REAL video decode in-container (the decode_ppm/decode_wav
    pattern) — canonical YUV4MPEG2 C420 clips round-trip through the
    pure-Python tier; out-of-subset shapes land in the error column by
    name. Closes the last fake-only modality."""
    import numpy as np

    from pubmed_central_semantic_search_spark.operators.multimodal import (
        decode_video_stats,
        decode_y4m,
        make_y4m,
    )

    frames = [np.arange(24) % 256, (np.arange(24) + 100) % 256]
    blob = make_y4m(frames, 4, 4)
    w, h, got = decode_y4m(blob)
    assert (w, h, len(got)) == (4, 4, 2)
    assert all((a == b).all() for a, b in zip(got, frames))
    df = spark.createDataFrame(
        [
            ("ok", blob),
            ("c444", b"YUV4MPEG2 W4 H4 C444\nFRAME\n" + bytes(48)),
            ("odd", b"YUV4MPEG2 W3 H4 C420\nFRAME\n" + bytes(18)),
            ("trunc", blob[:-5]),
            ("junk", b"RIFF not a y4m"),
        ],
        "media_id string, content binary",
    )
    rows = {r["media_id"]: r for r in decode_video_stats(df).collect()}
    ok = rows["ok"]
    assert (ok["width"], ok["height"], ok["n_frames"]) == (4, 4, 2)
    assert ok["sum_luma"] == sum(int(f[:16].sum()) for f in frames)
    assert ok["sum_chroma"] == sum(int(f[16:].sum()) for f in frames)
    assert "C420 subset" in rows["c444"]["error"]
    assert "odd dimensions" in rows["odd"]["error"]
    assert "truncated frame data" in rows["trunc"]["error"]
    assert "not a YUV4MPEG2" in rows["junk"]["error"]


def test_sample_frames_real_decode_and_roundtrip(spark):
    """Round-8: REAL frame sampling (frame_sample_plan planned
    timestamps; sample_frames decodes) — every 2nd frame comes back as a
    round-trippable single-frame Y4M with its exact luma sum."""
    import numpy as np

    from pubmed_central_semantic_search_spark.operators.multimodal import (
        decode_y4m,
        make_y4m,
        sample_frames,
    )

    frames = [((np.arange(24) * (f + 1)) % 256) for f in range(5)]
    blob = make_y4m(frames, 4, 4)
    df = spark.createDataFrame(
        [("clip", blob), ("junk", b"nope")],
        "media_id string, content binary",
    )
    rows = sorted(
        (r for r in sample_frames(df, every_n=2).collect()
         if r["media_id"] == "clip"),
        key=lambda r: r["frame_index"],
    )
    assert [r["frame_index"] for r in rows] == [0, 2, 4]
    for r in rows:
        assert r["sum_luma"] == int(frames[r["frame_index"]][:16].sum())
        w, h, got = decode_y4m(bytes(r["content"]))
        assert (w, h, len(got)) == (4, 4, 1)
        assert (got[0] == frames[r["frame_index"]]).all()
    bad = [r for r in sample_frames(df).collect() if r["media_id"] == "junk"]
    assert len(bad) == 1 and "not a YUV4MPEG2" in bad[0]["error"]
    import pytest

    with pytest.raises(ValueError, match="every_n"):
        sample_frames(df, every_n=0)
