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
