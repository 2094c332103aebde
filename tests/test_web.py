import asyncio

import pytest

from deepsearch_tts_tpu.web.fetch import (
    PageFetcher,
    extract_pdf_text,
    html_to_text,
    looks_like_error_page,
)
from deepsearch_tts_tpu.web.ratelimit import RateLimiter
from deepsearch_tts_tpu.web.replay import (
    ReplaySearchBackend,
    ReplayStore,
    replay_fetcher,
    synthetic_store,
)
from deepsearch_tts_tpu.web.search import format_search_results, normalize_serper
from deepsearch_tts_tpu.web.snippets import extract_snippet_with_context, word_set_f1


def test_html_to_text_strips_script():
    html = "<html><head><title>t</title></head><body><script>x=1</script><p>Hello <b>world</b></p></body></html>"
    text = html_to_text(html)
    assert "Hello world" in text and "x=1" not in text


def test_html_keep_links():
    html = '<a href="http://x.test/page">anchor text</a>'
    text = html_to_text(html, keep_links=True)
    assert "anchor text" in text and "http://x.test/page" in text


def test_error_page_detection():
    assert looks_like_error_page("Access Denied - you don't have permission")
    assert looks_like_error_page("  ")
    assert not looks_like_error_page("A real article about science. " * 10)


def test_snippet_context_match():
    page = ("Intro text. " * 5 +
            "The capital of France is Paris, a major European city. " +
            "Outro text. " * 5)
    ok, ctx = extract_snippet_with_context(page, "capital of France is Paris",
                                           context_chars=30)
    assert ok and "Paris" in ctx and len(ctx) < len(page)


def test_snippet_fallback_head():
    ok, ctx = extract_snippet_with_context("Completely unrelated content here.",
                                           "quantum entanglement dynamics")
    assert not ok and ctx.startswith("Completely")


def test_word_f1():
    assert word_set_f1("a b c", "a b c") == 1.0
    assert word_set_f1("a b", "c d") == 0.0


def test_normalize_serper():
    rows = normalize_serper({
        "organic": [{"title": "T", "link": "http://u", "snippet": "S"}],
        "knowledgeGraph": {"title": "KG", "description": "D"},
    })
    assert rows[0]["site_name"] == "Knowledge Graph"
    assert rows[1]["url"] == "http://u"
    assert "http://u" in format_search_results(rows)


def test_replay_roundtrip(tmp_path):
    store = synthetic_store({"capital of france": "Paris is the capital of France."})
    p = tmp_path / "fix.json"
    store.save(str(p))
    loaded = ReplayStore.load(str(p))
    backend = ReplaySearchBackend(loaded)

    rows = asyncio.run(backend.search("capital of france"))
    assert rows and "Paris" in rows[0]["snippet"]
    # fuzzy match on near-miss query
    rows2 = asyncio.run(backend.search("what is the capital of france?"))
    assert rows2 == rows

    fetcher = PageFetcher(raw_fetch=replay_fetcher(loaded))
    text = asyncio.run(fetcher.fetch_page(rows[0]["url"]))
    assert "Paris is the capital" in text


def test_replay_strict_miss():
    backend = ReplaySearchBackend(ReplayStore(), strict=True)
    with pytest.raises(KeyError):
        asyncio.run(backend.search("nope"))


def test_fetcher_cache_and_errors():
    calls = []

    def raw(url):
        calls.append(url)
        return b"<p>fine page content here with enough words to pass checks</p>", "text/html"

    f = PageFetcher(raw_fetch=raw)
    t1 = asyncio.run(f.fetch_page("http://a.test"))
    t2 = asyncio.run(f.fetch_page("http://a.test"))
    assert t1 == t2 and len(calls) == 1

    def boom(url):
        raise OSError("connection refused")

    f2 = PageFetcher(raw_fetch=boom)
    t = asyncio.run(f2.fetch_page("http://b.test"))
    assert t.startswith("Error fetching")


def test_pdf_text_extraction():
    pdf = (b"%PDF-1.4 stream\n"
           b"BT (Hello) Tj (World) Tj ET\n"
           b"endstream")
    assert "Hello" in extract_pdf_text(pdf)


def test_rate_limiter_allows_burst():
    async def go():
        rl = RateLimiter(600, burst=5)
        for _ in range(5):
            await rl.acquire()
    asyncio.run(go())


def test_connection_pool_keepalive_localhost():
    """ConnectionPool reuses keep-alive sockets and follows redirects,
    against a local threaded HTTP server (hermetic)."""
    import http.server
    import threading

    from deepsearch_tts_tpu.web.fetch import ConnectionPool

    class Handler(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"
        hits = []

        def do_GET(self):
            self.hits.append(self.path)
            if self.path == "/redir":
                self.send_response(302)
                self.send_header("Location", "/target")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            body = f"hello from {self.path}".encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        pool = ConnectionPool()
        data, ctype = pool.fetch(base + "/a")
        assert data == b"hello from /a" and "text/plain" in ctype
        # second request on the same host reuses the pooled connection
        assert pool.fetch(base + "/b")[0] == b"hello from /b"
        key = ("http", "127.0.0.1", srv.server_address[1])
        assert len(pool._idle.get(key, [])) == 1
        # redirect following
        assert pool.fetch(base + "/redir")[0] == b"hello from /target"
    finally:
        srv.shutdown()


def test_webparser_client_fallback_tier():
    """Failed fetches are batched to the WebParserClient seam after the
    direct pass (reference bing_search.py:218-231 semantics)."""
    from deepsearch_tts_tpu.web.fetch import PageFetcher, WebParserClient

    calls = []

    def transport(endpoint, payload):
        calls.append((endpoint, payload))
        return {"results": [
            {"url": u, "success": u.endswith("ok"),
             "content": f"parsed {u}", "error": "boom"}
            for u in payload["urls"]
        ]}

    def raw(url):
        if "bad" in url or "ok" in url:
            raise OSError("connection refused")
        return b"<p>" + url.encode() + b" body text that is long enough to pass the error heuristic</p>", "text/html"

    parser = WebParserClient("http://parse.test", transport=transport)
    f = PageFetcher(raw_fetch=raw, fallback_parser=parser)
    out = asyncio.run(f.fetch_pages(
        ["http://a.test/good", "http://a.test/bad", "http://a.test/ok"]))
    assert "body text" in out["http://a.test/good"]
    assert out["http://a.test/ok"] == "parsed http://a.test/ok"   # rescued
    assert out["http://a.test/bad"].startswith("Error fetching")  # not rescued
    assert calls and calls[0][0] == "http://parse.test/parse_urls"
    assert set(calls[0][1]["urls"]) == {"http://a.test/bad", "http://a.test/ok"}


def test_jina_markdown_cleanup():
    from deepsearch_tts_tpu.web.fetch import clean_jina_markdown

    md = "Title\n---\nsee [http://x.test/a] and (https://y.test/b) end"
    out = clean_jina_markdown(md)
    assert "http://" not in out and "https://" not in out
    assert "---" not in out


def test_normalize_pro_three_sources():
    """The gateway normalizer handles Serper, Tencent, and Bing-Pro shapes
    (reference bing_search.py:913-1052)."""
    import json as _json

    from deepsearch_tts_tpu.web.search import normalize_pro

    serper = {"organic": [{"title": "t", "link": "http://a.test/x",
                           "snippet": "s"}],
              "knowledgeGraph": {"title": "KG", "description": "d"}}
    out = normalize_pro(serper)
    assert out[0]["id"] == 0 and out[0]["title"] == "KG"
    assert out[1]["url"] == "http://a.test/x"

    tencent = {"code": "200", "tencentSearchResults": {"Response": {"Pages": [
        _json.dumps({"title": "tt", "url": "http://t.test/a/b",
                     "passage": "pp", "date": "2024-01-02 10:00"}),
        "not json",
    ]}}}
    out = normalize_pro(tencent)
    assert len(out) == 1
    assert out[0]["snippet"] == "pp" and out[0]["date"] == "2024-01-02"
    assert out[0]["site_name"] == "t.test"

    pro = {"code": "200", "bingSearchProResults": {"webPages": {"value": [{
        "name": "n", "url": "http://b.test/q", "displayUrl": "b.test/q",
        "datePublished": "2023-05-06T00:00:00", "snippet": "sn",
        "about": [{"aggregateRating": {"ratingValue": 4.5,
                                       "reviewCount": 7, "bestRating": 5}}],
    }]}}}
    out = normalize_pro(pro)
    assert out[0]["date"] == "2023-05-06" and out[0]["rating"]["count"] == 7

    assert normalize_pro({"code": "403", "error": "denied"}) == []


def test_bing_pro_backend_token_rotation_and_retry():
    from deepsearch_tts_tpu.web.search import BingProBackend

    seen_tokens = []
    calls = {"n": 0}

    def transport(url, payload, headers):
        seen_tokens.append(headers["Authorization"].removeprefix("Bearer "))
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("gateway 500")
        assert payload == {"query": "q", "api": "bing-search-pro"}
        return {"code": "200", "bingSearchProResults": {"webPages": {"value": [
            {"name": "hit", "url": "http://x.test", "snippet": "s"}]}}}

    b = BingProBackend("tok1, tok2", transport=transport)
    out = asyncio.run(b.search("q"))
    assert out[0]["title"] == "hit"
    assert calls["n"] == 2
    assert set(seen_tokens) <= {"tok1", "tok2"}
