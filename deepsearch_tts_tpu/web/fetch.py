"""Concurrent page fetching and text extraction.

Re-implements the reference's fetch pipeline semantics (reference:
scripts/search/bing_search.py:1246-1494 "turbo" fetcher): bounded-concurrency
async fetch, size caps, encoding detection, HTML→text extraction, PDF text
extraction, error-indicator heuristics on the extracted text, and per-URL
caching. Differences by design:

* stdlib ``html.parser``/``urllib`` instead of aiohttp/bs4/chardet (those are
  not all guaranteed present); the blocking socket work runs in a thread
  pool, keeping the asyncio interface.
* a pluggable ``fetcher`` callable so tests inject the offline replay store.
"""
from __future__ import annotations

import asyncio
import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Callable

MAX_PAGE_BYTES = 5 * 1024 * 1024
PAGE_TEXT_CAP = 50000
PDF_TEXT_CAP = 10000

# phrases that mark a fetched page as an error/paywall shell
# (same role as reference bing_search.py:64-77)
ERROR_INDICATORS = (
    "access denied", "403 forbidden", "404 not found", "page not found",
    "captcha", "verify you are human", "are you a robot",
    "enable javascript", "browser not supported", "cloudflare",
    "rate limit", "too many requests", "service unavailable",
)


class _TextExtractor(HTMLParser):
    SKIP = {"script", "style", "noscript", "svg", "head", "iframe"}

    def __init__(self, keep_links: bool = False):
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.links: list[tuple[str, str]] = []
        self._skip_depth = 0
        self._href: str | None = None
        self.keep_links = keep_links

    def handle_starttag(self, tag, attrs):
        if tag in self.SKIP:
            self._skip_depth += 1
        elif tag == "a" and self.keep_links:
            self._href = dict(attrs).get("href")
        elif tag in ("p", "br", "div", "li", "tr", "h1", "h2", "h3", "h4"):
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in self.SKIP and self._skip_depth:
            self._skip_depth -= 1
        elif tag == "a":
            self._href = None

    def handle_data(self, data):
        if self._skip_depth == 0 and data.strip():
            self.parts.append(data)
            if self._href:
                self.links.append((data.strip(), self._href))


def html_to_text(html: str, keep_links: bool = False) -> str:
    p = _TextExtractor(keep_links)
    try:
        p.feed(html)
    except Exception:
        pass
    text = "".join(p.parts)
    text = re.sub(r"[ \t]+", " ", text)
    text = re.sub(r"\n\s*\n+", "\n", text)
    if keep_links and p.links:
        text += "\n\nLinks:\n" + "\n".join(f"[{t}]({h})" for t, h in p.links[:100])
    return text.strip()


def extract_pdf_text(data: bytes) -> str:
    """Best-effort PDF text without external deps: pull text runs from
    uncompressed content streams; compressed streams are inflated via zlib."""
    import zlib

    chunks: list[str] = []
    for m in re.finditer(rb"stream\r?\n(.*?)endstream", data, re.DOTALL):
        raw = m.group(1)
        try:
            raw = zlib.decompress(raw)
        except Exception:
            pass
        for tm in re.finditer(rb"\(((?:[^()\\]|\\.)*)\)\s*T[jJ]", raw):
            try:
                chunks.append(tm.group(1).decode("latin-1"))
            except Exception:
                continue
    text = " ".join(chunks)
    return re.sub(r"\s+", " ", text)[:PDF_TEXT_CAP]


def looks_like_error_page(text: str) -> bool:
    head = text[:1000].lower()
    return len(text.strip()) < 64 or any(ind in head for ind in ERROR_INDICATORS)


def _decode_bytes(data: bytes, content_type: str) -> str:
    m = re.search(r"charset=([\w-]+)", content_type or "")
    encodings = [m.group(1)] if m else []
    encodings += ["utf-8", "latin-1"]
    for enc in encodings:
        try:
            return data.decode(enc)
        except (LookupError, UnicodeDecodeError):
            continue
    return data.decode("utf-8", errors="replace")


def _urllib_fetch(url: str, timeout: float = 20.0) -> tuple[bytes, str]:
    import urllib.request

    req = urllib.request.Request(url, headers={
        "User-Agent": "Mozilla/5.0 (X11; Linux x86_64) deepsearch-tts-tpu/0.1",
        "Accept": "text/html,application/xhtml+xml,application/pdf,*/*",
    })
    with urllib.request.urlopen(req, timeout=timeout) as r:
        ctype = r.headers.get("Content-Type", "")
        data = r.read(MAX_PAGE_BYTES)
    return data, ctype


@dataclass
class PageFetcher:
    """Bounded-concurrency fetch + extract with caching.

    ``raw_fetch(url) -> (bytes, content_type)`` is pluggable; the default
    uses urllib in a thread. Results are cached per URL (the reference
    shares a url_cache across the explorer, deep_search.py:676).
    """

    max_concurrent: int = 64
    keep_links: bool = False
    timeout: float = 20.0
    raw_fetch: Callable[[str], tuple[bytes, str]] | None = None
    cache: dict = field(default_factory=dict)

    def __post_init__(self):
        self._sem: asyncio.Semaphore | None = None

    def _semaphore(self) -> asyncio.Semaphore:
        if self._sem is None:
            self._sem = asyncio.Semaphore(self.max_concurrent)
        return self._sem

    async def fetch_page(self, url: str) -> str:
        if url in self.cache:
            return self.cache[url]
        async with self._semaphore():
            try:
                fetch = self.raw_fetch or (lambda u: _urllib_fetch(u, self.timeout))
                data, ctype = await asyncio.get_running_loop().run_in_executor(
                    None, fetch, url
                )
                if url.lower().endswith(".pdf") or "pdf" in (ctype or ""):
                    text = extract_pdf_text(data)
                else:
                    text = html_to_text(_decode_bytes(data, ctype), self.keep_links)
                text = text[:PAGE_TEXT_CAP]
                if looks_like_error_page(text):
                    text = f"Error fetching {url}: page returned an error or empty content."
            except Exception as e:
                text = f"Error fetching {url}: {e}"
        self.cache[url] = text
        return text

    async def fetch_pages(self, urls: list[str]) -> dict[str, str]:
        texts = await asyncio.gather(*(self.fetch_page(u) for u in urls))
        return dict(zip(urls, texts))
