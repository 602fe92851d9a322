"""EuropePMC source (SURVEY §2.1 S5): REST fetch by PMCID + JATS-XML parse.

Reference behavior (``/root/reference/src/backend/data_fetching/fetch_pmcid.py:4-36``):
GET ``https://www.ebi.ac.uk/europepmc/webservices/rest/{pmcid}/fullTextXML``,
then from the JATS tree extract:

- ``article_id`` = text of ``article-id[@pub-id-type='pmcid']`` prefixed
  ``PMC`` (:12-13),
- abstract = all inner text of the first ``<abstract>`` child (:17),
- per ``<sec>``: the ``<title>`` text → section name; every non-title
  descendant's ``text``+``tail`` joined with ``'\\n'`` → section text
  (:19-24),
- citation brackets ``[...]`` stripped, paragraphs re-joined with ``'.'``
  (:26-28), and ``"Abstract"`` prepended to section_names with the
  abstract as section 0 (:20,28).

Spark design: parsing is a **mapInPandas** stage over (pmcid, xml) rows —
at scale you download XML once into object storage (binaryFile/text
source), then parse executor-side; the network fetch itself is isolated in
``fetch_xml_udf`` (requests behind an import-try) so the parse path is
fully offline-testable. stdlib ElementTree only — no lxml dependency.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from ..session import local_df

PARSED_SCHEMA = (
    "pmcid string, article_id string, section_names array<string>, "
    "sections array<array<string>>, abstract_text string, error string"
)

EUROPEPMC_URL = "https://www.ebi.ac.uk/europepmc/webservices/rest/{}/fullTextXML"


def parse_jats(
    xml_text: str, chunk_sep: str = ". ", reference_compat: bool = False
) -> dict:
    """Parse one JATS fullTextXML document into the canonical article shape
    (ARTICLES_SCHEMA + pmcid). Pure function — no I/O, no Spark.

    Deliberate deviation (recorded, SURVEY S5): the reference reads the
    abstract via ``find(".//abstract/*")`` — the FIRST CHILD only — so a
    structured abstract (multiple ``<sec>``) loses everything after its
    first block (``fetch_pmcid.py:17``). By default this parser reads the
    whole ``<abstract>`` subtree (stripped); for single-block abstracts
    (the reference's test regime) the two are identical.

    ``reference_compat=True`` replicates the reference bit-for-bit when
    parity matters: first-child-only itertext, NO strip — a structured
    abstract then loses its later blocks exactly as the reference does,
    and an abstract with no child elements (bare text) yields ''."""
    if not reference_compat:
        # ONE parse core (round-8: the executor stage used to carry an
        # inline copy — twin-divergence hazard, now collapsed)
        article_id, names, secs, abstract = _jats_core_fn()(
            xml_text, chunk_sep=chunk_sep
        )
        return {
            "article_id": article_id,
            "section_names": names,
            "sections": secs,
            "abstract_text": abstract,
        }

    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_text)
    id_el = next(
        (
            el
            for el in root.iter("article-id")
            if el.get("pub-id-type") == "pmcid"
        ),
        None,
    )
    article_id = f"PMC{id_el.text}" if id_el is not None and id_el.text else None
    # reference_compat: first-abstract-child-only, unstripped
    # (fetch_pmcid.py:17 bit for bit)
    first_child = root.find(".//abstract/*")
    abstract = (
        "".join(first_child.itertext()) if first_child is not None else ""
    )
    section_names = ["Abstract"]
    sections = [[s for s in abstract.split(chunk_sep) if s]]
    for sec in root.iter("sec"):
        title_el = sec.find("title")
        title = title_el.text if title_el is not None else None
        parts = []
        for el in sec.iter():
            if el is sec or el.tag == "title":
                continue
            parts.append("".join(p for p in (el.text, el.tail) if p))
        text = "\n".join(parts)
        # :27 — strip bracketed citations (DOTALL), re-join with '.' (:28)
        text = re.sub(r"\[[^\]]*\]", "", text, flags=re.DOTALL)
        text = ".".join(text.split("\n"))
        section_names.append(title)
        sections.append([s for s in text.split(chunk_sep) if s])
    return {
        "article_id": article_id,
        "section_names": section_names,
        "sections": sections,
        "abstract_text": abstract,
    }


def _jats_core_fn():
    """Factory for the DEFAULT-mode JATS parser core — by-value
    shippable (the self-contained-closure rule: ``parse_articles``'s
    mapInPandas closure must not reference this module). ONE definition
    feeds both ``parse_jats`` (the driver-side public API, which adds
    the reference_compat/chunk_sep knobs on top) and the executor-side
    stage — round-8 review: the stage carried an inline COPY of the
    parse, the exact twin-divergence hazard the chunking module already
    closed (explode_chunks/chunk_key)."""

    def one(xml_text, chunk_sep=". "):
        import re as _re
        import xml.etree.ElementTree as _ET

        root = _ET.fromstring(xml_text)
        id_el = next(
            (
                el
                for el in root.iter("article-id")
                if el.get("pub-id-type") == "pmcid"
            ),
            None,
        )
        article_id = (
            f"PMC{id_el.text}" if id_el is not None and id_el.text else None
        )
        abstract_el = root.find(".//abstract")
        abstract = (
            "".join(abstract_el.itertext()).strip()
            if abstract_el is not None
            else ""
        )
        names = ["Abstract"]
        secs = [[s for s in abstract.split(chunk_sep) if s]]
        for sec in root.iter("sec"):
            title_el = sec.find("title")
            # fetch_pmcid.py:22-24, faithfully: PER ELEMENT, text+tail
            # concatenated with NO separator; '\n' joins only ACROSS
            # elements — empty elements contribute an EMPTY entry (the
            # reference's list comprehension keeps them, so consecutive
            # empties become consecutive newlines and later '..' runs)
            parts = []
            for el in sec.iter():
                if el is sec or el.tag == "title":
                    continue
                parts.append("".join(p for p in (el.text, el.tail) if p))
            text = _re.sub(
                r"\[[^\]]*\]", "", "\n".join(parts), flags=_re.DOTALL
            )
            text = ".".join(text.split("\n"))
            names.append(title_el.text if title_el is not None else None)
            secs.append([s for s in text.split(chunk_sep) if s])
        return article_id, names, secs, abstract

    return one


def parse_articles(xml_df: DataFrame) -> DataFrame:
    """mapInPandas parse stage: (pmcid, xml) → parsed article rows.

    Ships ``_jats_core_fn()``'s product by value (no module references —
    see encoder.py for the pickling rule); bad XML lands in the
    ``error`` column instead of failing the job (at 100 TB a poison
    document must not kill the run — unlike the reference's swallowed
    ``except: print``, qdrant.py:172-174, errors stay visible as data)."""
    one = _jats_core_fn()  # by-value shippable

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for pmcid, xml_text in zip(pdf["pmcid"], pdf["xml"]):
                try:
                    article_id, names, secs, abstract = one(xml_text)
                    # a cleanly-parsed doc without a pmcid article-id is
                    # STILL a poison row — without the flag it would look
                    # clean here yet be silently excluded from ingest
                    err = (
                        None
                        if article_id is not None
                        else "missing pmcid article-id"
                    )
                    out.append((pmcid, article_id, names, secs, abstract, err))
                except Exception as ex:  # poison row → error column
                    out.append((pmcid, None, None, None, None, repr(ex)[:500]))
            yield pd.DataFrame(
                out,
                columns=[
                    "pmcid",
                    "article_id",
                    "section_names",
                    "sections",
                    "abstract_text",
                    "error",
                ],
            )

    return xml_df.mapInPandas(_parse, PARSED_SCHEMA)


def fetch_articles(
    spark: SparkSession,
    pmcids: list[str],
    base_url: str = EUROPEPMC_URL,
    timeout: float = 30.0,
) -> DataFrame:
    """S5 online path: DataFrame of pmcids → HTTP fetch (mapInPandas, one
    session per partition) → parse. Requires ``requests``; the offline
    path (download first, then ``parse_articles``) is preferred at scale.

    ``base_url`` (a ``{}``-format template, default the EuropePMC REST
    endpoint the reference calls — ``fetch_pmcid.py:9-10``) exists so the
    HTTP leg itself is testable against an in-test ``http.server`` stub
    with no external network (tests/test_pmc_http.py): request path,
    timeout behavior, and HTTP-error → fetch-failed row all exercised
    in-container. A fetch failure yields xml=NULL, which the parser turns
    into a poison row (error column) — never a dropped pmcid."""
    pmcid_df = local_df(spark, [(p,) for p in pmcids], "pmcid string")
    url_t, tmo = str(base_url), float(timeout)  # ship-by-value closure

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import requests

        session = requests.Session()
        for pdf in batches:
            xmls = []
            for pmcid in pdf["pmcid"]:
                try:
                    resp = session.get(url_t.format(pmcid), timeout=tmo)
                    resp.raise_for_status()
                    xmls.append(resp.text)
                except Exception:
                    xmls.append(None)
            yield pd.DataFrame({"pmcid": pdf["pmcid"], "xml": xmls})

    xml_df = pmcid_df.mapInPandas(_fetch, "pmcid string, xml string")
    return parse_articles(xml_df)


def to_article_rows(parsed: DataFrame) -> DataFrame:
    """Parsed rows → ARTICLES_SCHEMA shape: poison rows (error != null)
    are excluded from ingest but stay queryable upstream.

    A cleanly-parsed document WITHOUT a pmcid article-id is promoted to a
    poison row here (error = 'missing pmcid article-id') rather than
    silently filtered — the module's errors-stay-visible-as-data rule; a
    whole fetched article must never vanish with no trace."""
    from pyspark.sql import functions as F

    flagged = parsed.withColumn(
        "error",
        F.when(
            F.col("error").isNull() & F.col("article_id").isNull(),
            F.lit("missing pmcid article-id"),
        ).otherwise(F.col("error")),
    )
    return flagged.filter(F.col("error").isNull()).select(
        "article_id", "section_names", "sections", "abstract_text"
    )
