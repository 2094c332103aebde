"""C++ radix index: build, bind, and behave like the Python tree."""
import pytest

from deepsearch_tts_tpu.engine.kvcache import PageAllocator
from deepsearch_tts_tpu.engine.prefix_cache import (
    NativePrefixCache,
    PrefixCache,
    make_prefix_cache,
)


def _native_or_skip():
    from deepsearch_tts_tpu.native import load_native

    if load_native() is None:
        pytest.skip("g++/native build unavailable")


def test_native_index_match_insert():
    _native_or_skip()
    from deepsearch_tts_tpu.native import NativeRadixIndex

    ix = NativeRadixIndex(page_size=4)
    tokens = list(range(12))
    ix.insert(tokens, [10, 11, 12])
    assert len(ix) == 3
    assert ix.match(tokens) == [10, 11, 12]
    assert ix.match(tokens[:8]) == [10, 11]
    assert ix.match([9, 9, 9, 9]) == []
    # partial overlap: shared first page
    tokens2 = list(range(4)) + [99, 98, 97, 96]
    new = ix.insert(tokens2, [10, 20])
    assert new == [20]  # first page already present
    assert ix.match(tokens2) == [10, 20]


def test_native_index_evict():
    _native_or_skip()
    from deepsearch_tts_tpu.native import NativeRadixIndex

    ix = NativeRadixIndex(page_size=2)
    ix.insert([1, 2, 3, 4], [5, 6])
    ix.insert([1, 2, 9, 9], [5, 7])
    # leaves are pages 6 and 7; evicting twice leaves only the shared root
    evicted = {ix.evict_lru(), ix.evict_lru()}
    assert evicted == {6, 7}
    assert ix.evict_lru() == 5
    assert ix.evict_lru() == -1


def test_native_prefix_cache_equiv_python():
    _native_or_skip()
    ps = 4
    seqs = [list(range(16)), list(range(8)) + [50] * 8, [7] * 16]

    results = []
    for cls in (PrefixCache, NativePrefixCache):
        alloc = PageAllocator(64, ps)
        cache = cls(alloc)
        log = []
        for s in seqs:
            pages = alloc.alloc(len(s) // ps)
            cache.insert(s, pages)
            log.append(("insert", len(pages)))
        for s in seqs:
            matched, n = cache.match(s)
            log.append(("match", len(matched), n))
        m, n = cache.match(seqs[0][:9])  # partial: 2 full pages
        log.append(("partial", len(m), n))
        results.append(log)
    assert results[0] == results[1]


def test_make_prefix_cache_fallback():
    alloc = PageAllocator(16, 4)
    cache = make_prefix_cache(alloc, prefer_native=False)
    assert isinstance(cache, PrefixCache)
