"""Search engine adapters with a uniform result schema.

Adapters for Serper (Google), Bing v7, and a deterministic replay backend
(web/replay.py). Result normalization matches the reference's
``extract_relevant_info`` family (reference: scripts/search/bing_search.py:414,
:912, :1197): every engine's response is flattened to rows of
``{id, title, url, site_name, date, snippet, context}``.

Network calls are gated: in a zero-egress environment only the replay
backend functions, which is exactly how the hermetic tests run (the
reference has no offline mode at all — SURVEY.md §4).
"""
from __future__ import annotations

import asyncio
import json
from dataclasses import dataclass, field
from typing import Protocol

from .ratelimit import RateLimiter


def normalize_serper(data: dict, top_k: int = 10) -> list[dict]:
    out = []
    for i, item in enumerate(data.get("organic", [])[:top_k]):
        out.append({
            "id": i + 1,
            "title": item.get("title", ""),
            "url": item.get("link", ""),
            "site_name": item.get("source", ""),
            "date": item.get("date", ""),
            "snippet": item.get("snippet", ""),
            "context": "",
        })
    kg = data.get("knowledgeGraph")
    if kg and kg.get("description"):
        out.insert(0, {
            "id": 0, "title": kg.get("title", ""),
            "url": kg.get("website", kg.get("descriptionLink", "")),
            "site_name": "Knowledge Graph", "date": "",
            "snippet": kg.get("description", ""), "context": "",
        })
    return out


def normalize_bing(data: dict, top_k: int = 10) -> list[dict]:
    pages = (data.get("webPages") or {}).get("value", [])[:top_k]
    return [{
        "id": i + 1,
        "title": p.get("name", ""),
        "url": p.get("url", ""),
        "site_name": p.get("siteName", ""),
        "date": p.get("datePublished", "")[:10] if p.get("datePublished") else "",
        "snippet": p.get("snippet", ""),
        "context": "",
    } for i, p in enumerate(pages)]


class SearchBackend(Protocol):
    async def search(self, query: str, top_k: int = 10) -> list[dict]: ...


@dataclass
class SerperBackend:
    """Google results via the Serper API (the reference README's default)."""

    api_key: str
    endpoint: str = "https://google.serper.dev/search"
    rate: RateLimiter = field(default_factory=lambda: RateLimiter(10, burst=10))
    max_retries: int = 5

    async def search(self, query: str, top_k: int = 10) -> list[dict]:
        import urllib.request

        await self.rate.acquire()
        body = json.dumps({"q": query, "num": top_k}).encode()

        def _do():
            req = urllib.request.Request(
                self.endpoint, data=body,
                headers={"X-API-KEY": self.api_key, "Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                return json.loads(r.read().decode())

        last_err: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                data = await asyncio.get_running_loop().run_in_executor(None, _do)
                return normalize_serper(data, top_k)
            except Exception as e:
                last_err = e
                await asyncio.sleep(min(2 ** attempt, 30))
        raise RuntimeError(f"serper search failed after retries: {last_err}")


@dataclass
class BingBackend:
    """Bing Web Search v7."""

    subscription_key: str
    endpoint: str = "https://api.bing.microsoft.com/v7.0/search"
    market: str = "en-US"
    rate: RateLimiter = field(default_factory=lambda: RateLimiter(30, burst=10))
    max_retries: int = 5

    async def search(self, query: str, top_k: int = 10) -> list[dict]:
        import urllib.parse
        import urllib.request

        await self.rate.acquire()
        url = (f"{self.endpoint}?q={urllib.parse.quote(query)}"
               f"&count={top_k}&mkt={self.market}")

        def _do():
            req = urllib.request.Request(
                url, headers={"Ocp-Apim-Subscription-Key": self.subscription_key}
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                return json.loads(r.read().decode())

        last_err: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                data = await asyncio.get_running_loop().run_in_executor(None, _do)
                return normalize_bing(data, top_k)
            except Exception as e:
                last_err = e
                await asyncio.sleep(min(2 ** attempt, 30))
        raise RuntimeError(f"bing search failed after retries: {last_err}")


@dataclass
class GoogleCSEBackend:
    """Google Programmable Search (Custom Search JSON API) — the reference's
    google_search.py capability (scripts/search/google_search.py)."""

    api_key: str
    cx: str
    endpoint: str = "https://www.googleapis.com/customsearch/v1"
    rate: RateLimiter = field(default_factory=lambda: RateLimiter(60, burst=10))
    max_retries: int = 5

    async def search(self, query: str, top_k: int = 10) -> list[dict]:
        import urllib.parse
        import urllib.request

        await self.rate.acquire()
        url = (f"{self.endpoint}?key={self.api_key}&cx={self.cx}"
               f"&q={urllib.parse.quote(query)}&num={min(top_k, 10)}")

        def _do():
            with urllib.request.urlopen(url, timeout=30) as r:
                return json.loads(r.read().decode())

        last_err: Exception | None = None
        for attempt in range(self.max_retries):
            try:
                data = await asyncio.get_running_loop().run_in_executor(None, _do)
                return [{
                    "id": i + 1,
                    "title": item.get("title", ""),
                    "url": item.get("link", ""),
                    "site_name": item.get("displayLink", ""),
                    "date": "",
                    "snippet": item.get("snippet", ""),
                    "context": "",
                } for i, item in enumerate(data.get("items", [])[:top_k])]
            except Exception as e:
                last_err = e
                await asyncio.sleep(min(2 ** attempt, 30))
        raise RuntimeError(f"google cse search failed after retries: {last_err}")


def format_search_results(results: list[dict]) -> str:
    """Render normalized rows for an LLM prompt (JSON-lines style)."""
    blocks = []
    for r in results:
        blocks.append(json.dumps({
            "id": r.get("id"), "title": r.get("title"), "url": r.get("url"),
            "site_name": r.get("site_name"), "date": r.get("date"),
            "snippet": r.get("snippet"),
            "context": (r.get("context") or "")[:4000],
        }, ensure_ascii=False, indent=2))
    return "\n\n".join(blocks)
