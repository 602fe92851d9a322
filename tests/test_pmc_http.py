"""S5's HTTP leg against an IN-TEST stub server (round-5 verdict #6):
the request path, the HTTP-error row, and the timeout row had never been
exercised — only the offline parse. A loopback ``http.server`` serving
the canned JATS fixture proves all three with no external network
(reference: ``src/backend/data_fetching/fetch_pmcid.py:9-10``)."""

from __future__ import annotations

import http.server
import os
import threading
import time

import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "pmc_article.xml")


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 — http.server API
        if "PMC123" in self.path:
            body = open(FIXTURE, "rb").read()
            self.send_response(200)
            self.send_header("Content-Type", "application/xml")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif "PMC500" in self.path:
            self.send_error(500, "boom")
        elif "PMCSLOW" in self.path:
            time.sleep(3)  # longer than the client timeout
            try:
                self.send_error(504)
            except BrokenPipeError:
                pass  # client already gave up — that's the point
        else:
            self.send_error(404)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def stub_server():
    try:
        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    except OSError as e:  # no loopback in this sandbox
        pytest.skip(f"cannot bind loopback: {e}")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/rest/{{}}/fullTextXML"
    srv.shutdown()


def test_fetch_articles_http_ok_error_and_timeout(spark, stub_server):
    pytest.importorskip("requests")
    from pubmed_central_semantic_search_spark.sources.pmc import fetch_articles

    out = fetch_articles(
        spark,
        ["PMC123", "PMC500", "PMCSLOW"],
        base_url=stub_server,
        timeout=1.0,
    )
    rows = {r["pmcid"]: r for r in out.collect()}
    assert set(rows) == {"PMC123", "PMC500", "PMCSLOW"}
    ok = rows["PMC123"]
    assert ok["error"] is None
    assert ok["article_id"] and ok["article_id"].startswith("PMC")
    assert ok["section_names"][0] == "Abstract"
    assert any(s for s in ok["sections"])  # parsed body text present
    # HTTP 500 → fetch failed → poison row, pmcid preserved
    assert rows["PMC500"]["error"] is not None
    assert rows["PMC500"]["article_id"] is None
    # timeout (server sleeps past the client deadline) → poison row
    assert rows["PMCSLOW"]["error"] is not None


def test_fetch_articles_http_then_ingest_shape(spark, stub_server):
    """The fetched frame flows into to_article_rows: the clean row
    survives with the ARTICLES_SCHEMA shape, poison rows are excluded."""
    pytest.importorskip("requests")
    from pubmed_central_semantic_search_spark.sources.pmc import (
        fetch_articles,
        to_article_rows,
    )

    parsed = fetch_articles(
        spark, ["PMC123", "PMC500"], base_url=stub_server, timeout=2.0
    )
    arts = to_article_rows(parsed)
    got = arts.collect()
    assert len(got) == 1
    assert got[0]["article_id"].startswith("PMC")
    assert len(got[0]["section_names"]) == len(got[0]["sections"])
