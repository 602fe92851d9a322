"""Property-based pins for the round-7 surfaces: PPM encode/decode
round-trip, the rank-skipping segmenter's equivalence to the stacked
Catalyst folds on RANDOM merge tables (including duplicates and shared
symbols — the rank-revisit shapes hand-written cases miss), PDF literal-
string escaping, and the heap trainer vs a brute-force Python argmax.

Pure-Python properties run at full hypothesis budget; Spark-backed ones
are capped like tests/test_properties.py."""

from hypothesis import HealthCheck, given, settings, example
from hypothesis import strategies as st

from pubmed_central_semantic_search_spark.operators.multimodal import decode_ppm
from pubmed_central_semantic_search_spark.sources.pdf import (
    make_minimal_pdf,
    pdf_textlite,
)

PY_PROP = settings(max_examples=100, deadline=None)


@PY_PROP
@given(
    w=st.integers(1, 6),
    h=st.integers(1, 5),
    data=st.data(),
)
def test_ppm_encode_decode_roundtrip(w, h, data):
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    blob = f"P6\n{w} {h}\n255\n".encode() + px
    got_w, got_h, arr = decode_ppm(blob)
    assert (got_w, got_h) == (w, h)
    assert arr.tobytes() == px


# printable latin-1 minus control chars; backslash and parens included so
# the escape paths are exercised constantly
_pdf_char = st.characters(
    min_codepoint=32, max_codepoint=255, exclude_characters="\x7f"
)


@PY_PROP
@given(lines=st.lists(st.text(_pdf_char, min_size=0, max_size=30),
                      min_size=1, max_size=5))
@example(lines=["ET"])  # round-8 find: 'ET' INSIDE a literal string used
# to terminate the BT(.*?)ET block regex mid-string (unterminated '(ET')
@example(lines=["BT", "x ET y"])
@example(lines=["endstream"])  # round-8 find: the segmentation walk used
# to truncate the body at 'endstream' BYTES inside a shown string; the
# dict's /Length now delimits the body first
def test_pdf_generator_textlite_roundtrip(lines):
    n_pages, text = pdf_textlite(make_minimal_pdf(lines))
    assert n_pages == 1
    assert text == "\n".join(lines)


def _fold_reference(word, merges, eow="</w>"):
    """The stacked-fold semantics in plain Python: apply every rule once,
    in order, all occurrences left-to-right."""
    syms = list(word) + [eow]
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


_sym = st.sampled_from(["a", "b", "c", "ab", "bc", "abc", "aa", "</w>"])


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    word=st.text(st.sampled_from("abc"), min_size=0, max_size=10),
    merges=st.lists(st.tuples(_sym, _sym), min_size=0, max_size=12),
)
def test_segmenter_rank_skip_equals_fold_reference(spark, word, merges):
    """The rank-skipping algorithm inside bpe_segment_udf must equal the
    all-rules in-order fold on ANY table — duplicates, self-pairs, rules
    over compound symbols, rules whose pair only exists after a later
    merge. Exercised via the udf's own inner function (extracted through
    .func — udf REGISTRATION needs the session fixture, but no Spark job
    runs per example)."""
    from pubmed_central_semantic_search_spark.operators.bpe import (
        bpe_segment_udf,
    )
    import pandas as pd

    fn = bpe_segment_udf(merges).func
    [got] = fn(pd.Series([word])).tolist()
    assert got == _fold_reference(word, merges)


SPARK_PROP = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SPARK_PROP
@given(
    vocab=st.dictionaries(
        st.text(st.sampled_from("abcd"), min_size=1, max_size=6),
        st.integers(1, 50),
        min_size=1,
        max_size=12,
    ),
    n_merges=st.integers(1, 8),
)
def test_heap_trainer_argmax_equals_scan_reference(spark, vocab, n_merges):
    """The lazy-heap argmax inside bpe_train_local must pick the same
    merge sequence as a brute-force (count desc, a, b) scan — the
    property the round-7 heap rewrite must not have broken. Reference is
    a plain-Python sequential trainer."""

    def reference(vocab_items, n):
        words = {w: list(w) + ["</w>"] for w, _ in vocab_items}
        counts = dict(vocab_items)
        merges = []
        for _ in range(n):
            pc = {}
            for w, syms in words.items():
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    pc[p] = pc.get(p, 0) + counts[w]
            live = [(c, p) for p, c in pc.items() if c > 0]
            if not live:
                break
            best = min(live, key=lambda cp: (-cp[0], cp[1][0], cp[1][1]))[1]
            merges.append(best)
            a, b = best
            for w, syms in words.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                words[w] = out
        return merges

    from pubmed_central_semantic_search_spark.operators.bpe import (
        bpe_train_local,
    )

    items = sorted(vocab.items())
    df = spark.createDataFrame(items, "token string, count bigint")
    got = bpe_train_local(df, n_merges)
    assert got == reference(items, n_merges)


@SPARK_PROP
@given(
    keys=st.lists(st.integers(-5, 2100), min_size=0, max_size=12, unique=True)
)
def test_batch_lookup_equals_full_scan_filter(spark, tmp_path_factory, keys):
    """The pruned batch lookup must return EXACTLY the full-scan filter's
    rows for any key set — including absent, negative, and empty keys
    (empty set → empty result, no crash)."""
    from pyspark.sql import functions as F

    from pubmed_central_semantic_search_spark.operators import topk  # noqa: F401
    from pubmed_central_semantic_search_spark.sources.catalog import (
        read_upsert_table,
        upsert_parquet,
    )

    global _BL_PATH
    try:
        path = _BL_PATH
    except NameError:
        path = str(tmp_path_factory.mktemp("bl") / "t")
        df = spark.range(2048).selectExpr("id AS k", "CAST(id AS STRING) AS v")
        upsert_parquet(spark, df, path, key_cols=["k"], n_buckets=16)
        _BL_PATH = path
    got = sorted(
        (r["k"], r["v"])
        for r in read_upsert_table(spark, path, key_equals={"k": keys}).collect()
    )
    want = sorted(
        (r["k"], r["v"])
        for r in read_upsert_table(spark, path)
        .filter(F.col("k").isin(keys) if keys else F.lit(False))
        .collect()
    )
    assert got == want


@PY_PROP
@given(lines=st.lists(st.text(_pdf_char, min_size=0, max_size=30),
                      min_size=1, max_size=5))
@example(lines=["ET"])
@example(lines=["stream", "endstream x"])  # keywords inside shown text
def test_pdf_flate_generator_textlite_roundtrip(lines):
    """Round-8 S6: the FlateDecode tier — same property as the
    uncompressed roundtrip, through zlib-compressed content streams
    (make_minimal_pdf(compress=True) declares /Filter /FlateDecode and
    pdf_textlite inflates with stdlib zlib)."""
    n_pages, text = pdf_textlite(make_minimal_pdf(lines, compress=True))
    assert n_pages == 1
    assert text == "\n".join(lines)


def test_pdf_flate_predictor_tier_roundtrip_and_raises():
    """Round-10 (verdict #7, upgrading the round-9 raise-by-name): PNG
    row filters (Sub/Up/Average/Paeth, cycled by the generator) and TIFF
    horizontal differencing now UN-PREDICT after inflation — predictor
    fixtures extract exactly; corrupt/lying predictor declarations and
    unsupported geometry still raise BY NAME, never garbled text."""
    import pytest

    lines = ["hello predictor", "second (line)", "third \\ line"]
    for pred, cols in [(2, 16), (10, 7), (15, 16), (12, 3), (15, 1)]:
        n_pages, text = pdf_textlite(
            make_minimal_pdf(lines, predictor=pred, columns=cols)
        )
        assert n_pages == 1
        assert text == "\n".join(lines), (pred, cols)
    # a LYING predictor declaration on a plain deflated stream: the first
    # "filter byte" is ordinary text, an unknown PNG filter — raises by
    # name instead of scanning predictor-garbled bytes
    blob = make_minimal_pdf(lines, compress=True)
    patched = blob.replace(
        b"/Length ",
        b"/DecodeParms << /Predictor 12 /Columns 4 >> /Length ",
        1,
    )
    assert patched != blob
    with pytest.raises(ValueError, match="PNG row filter"):
        pdf_textlite(patched)
    # unsupported predictor values and sample widths raise by name
    blob2 = make_minimal_pdf(lines, predictor=2, columns=4)
    with pytest.raises(ValueError, match="/Predictor 3"):
        pdf_textlite(blob2.replace(b"/Predictor 2", b"/Predictor 3"))
    with pytest.raises(ValueError, match="BitsPerComponent"):
        pdf_textlite(blob2.replace(
            b"/Columns 4", b"/Columns 4 /BitsPerComponent 4"
        ))


_lookup_scalar = st.one_of(
    st.integers(min_value=-(2**62), max_value=2**62),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(
        st.characters(blacklist_categories=("Cs",)), min_size=0, max_size=20
    ),
)
_lookup_value = st.one_of(
    _lookup_scalar,
    st.lists(_lookup_scalar, min_size=0, max_size=5),
    st.tuples(_lookup_scalar, _lookup_scalar),
)


@PY_PROP
@given(kv=st.dictionaries(
    st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True),
    _lookup_value, min_size=1, max_size=4,
))
def test_parse_lookup_roundtrips_python_literals(kv):
    """Round-9 parser fix, property form: any dict of identifier keys to
    Python scalar/list/tuple literals survives repr -> _parse_lookup —
    including strings with quotes/backslashes/commas (the escape fix)
    and parenthesized tuples (the greedy-regex fix)."""
    from pubmed_central_semantic_search_spark.sql import _parse_lookup

    s = ", ".join(f"{k} = {v!r}" for k, v in kv.items())
    assert _parse_lookup(s) == kv
