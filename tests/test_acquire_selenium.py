"""Offline tests for the live-browser loop contracts (selenium_fetch.py):
A1 pagination and A2 scroll-harvest semantics against a fake BrowserPort —
no Selenium, no network, every termination branch exercised."""

from __future__ import annotations

import pytest

from e2e_etl_pipeline_spark.sources.selenium_fetch import (
    LOOP_STYLE,
    URL_TEMPLATES,
    make_browser_fetcher,
    paginated_fetch,
    scroll_fetch,
)


class FakePagedPort:
    """Serves a fixed sequence of pages, then reports no next control."""

    def __init__(self, pages):
        self._pages = pages
        self._at = 0
        self.opened = None
        self.closed = False

    def open(self, url):
        self.opened = url

    def harvest(self):
        return list(enumerate(self._pages[self._at]))

    def next_page(self):
        if self._at + 1 >= len(self._pages):
            return False
        self._at += 1
        return True

    def scroll(self):  # pragma: no cover - not used by pagination
        raise AssertionError("pagination loop must not scroll")

    def close(self):
        self.closed = True


class FakeScrollPort:
    """Reveals batches of (index, html) rows per scroll round; once the
    batches run out, every further harvest repeats the final view (the
    stale-progress condition)."""

    def __init__(self, batches):
        self._batches = batches
        self._round = 0
        self.scrolls = 0
        self.closed = False

    def open(self, url):
        pass

    def harvest(self):
        visible = []
        for b in self._batches[: self._round + 1]:
            visible.extend(b)
        return visible

    def next_page(self):  # pragma: no cover - not used by scroll
        raise AssertionError("scroll loop must not paginate")

    def scroll(self):
        self.scrolls += 1
        if self._round + 1 < len(self._batches):
            self._round += 1

    def close(self):
        self.closed = True


def test_paginated_fetch_concatenates_pages_in_order():
    port = FakePagedPort([["a0", "a1"], ["b0"], ["c0", "c1"]])
    out = paginated_fetch(port, "http://x")
    assert out == [(0, "a0"), (1, "a1"), (2, "b0"), (3, "c0"), (4, "c1")]


def test_paginated_fetch_respects_page_cap():
    port = FakePagedPort([["p"]] * 10)
    out = paginated_fetch(port, "http://x", max_pages=3)
    assert len(out) == 3


def test_scroll_fetch_dedups_first_write_wins_and_sorts_by_index():
    # round 2 re-serves index 1 with different html: the first write wins
    # (extract_data.py:194-197); output is int-sorted (:245).
    port = FakeScrollPort(
        [[(1, "one"), (0, "zero")], [(2, "two"), (1, "ONE-CHANGED")], [(10, "ten")]]
    )
    out = scroll_fetch(port, "http://x", max_stale_rounds=2, max_rounds=50)
    assert out == [(0, "zero"), (1, "one"), (2, "two"), (10, "ten")]


def test_scroll_fetch_stops_after_stale_rounds():
    port = FakeScrollPort([[(0, "only")]])
    scroll_fetch(port, "http://x", max_stale_rounds=3, max_rounds=100)
    # The watermark baselines AFTER the initial harvest (reference
    # extract_data.py:218-223), so a page that never grows burns its
    # stale budget from loop round 1: stale rounds 1 and 2 each scroll,
    # round 3 breaks before scrolling — exactly 2 scrolls, no free
    # first-sight round.
    assert port.scrolls == 2


def test_scroll_fetch_bounded_by_max_rounds():
    class EndlessPort(FakeScrollPort):
        def harvest(self):
            # a new row every round: progress never goes stale
            return [(self.scrolls, f"row{self.scrolls}")]

    port = EndlessPort([])
    out = scroll_fetch(port, "http://x", max_stale_rounds=5, max_rounds=7)
    assert len(out) == 7


def test_make_browser_fetcher_dispatch_and_teardown():
    made = {}

    def factory(site):
        port = (
            FakeScrollPort([[(0, "s0")]])
            if LOOP_STYLE[site] == "scroll"
            else FakePagedPort([["p0"]])
        )
        made[site] = port
        return port

    fetch = make_browser_fetcher(factory)
    assert fetch("jjit", "warszawa", "junior") == [(0, "s0")]
    assert fetch("ppl", "warszawa", "junior") == [(0, "p0")]
    assert all(p.closed for p in made.values())
    assert "warszawa" in URL_TEMPLATES["jjit"].format(
        region="warszawa", experience="junior"
    )


def test_browser_fetcher_feeds_acquire_dataframe(spark):
    """End-to-end: the browser fetcher plugs into fetched_documents and
    yields the standard raw-document frame."""
    import datetime as dt

    from e2e_etl_pipeline_spark.sources.acquire import fetched_documents

    fetch = make_browser_fetcher(lambda site: FakeScrollPort([[(0, "<ul/>")]]))
    df = fetched_documents(
        spark,
        [("jjit", "wro", "mid")],
        ingest_date=dt.date(2026, 1, 15),
        fetcher=fetch,
    )
    row = df.first()
    assert (row.site, row.region, row.doc_id, row.html) == ("jjit", "wro", 0, "<ul/>")


def test_selenium_port_raises_cleanly_without_selenium():
    from e2e_etl_pipeline_spark.sources.selenium_fetch import selenium_port

    try:
        import selenium  # noqa: F401
    except ImportError:
        with pytest.raises(NotImplementedError):
            selenium_port("jjit")


def test_scroll_loops_agree_on_stale_accounting():
    """Cross-module drift guard: selenium_fetch.scroll_fetch (row-wise) and
    selenium_fetcher.scroll_harvest (merged artifact) implement the SAME
    reference loop (extract_data.py:199-246); fed an identical reveal
    schedule they must harvest the same item set and burn the same number
    of scroll rounds — the stale-accounting drift the round-4 advisor
    caught must not reopen."""
    from e2e_etl_pipeline_spark.sources.selenium_fetcher import scroll_harvest

    batches = [[(0, "a"), (1, "b")], [(2, "c")], [], [(3, "d")]]

    class FakeListing:
        def __init__(self):
            self._round = 0
            self.scrolls = 0

        def visible_items(self):
            return [
                (str(i), h)
                for b in batches[: self._round + 1]
                for i, h in b
            ]

        def scroll_by(self, pixels):
            self.scrolls += 1
            if self._round + 1 < len(batches):
                self._round += 1

    for stale_budget in (1, 2, 5):
        port = FakeScrollPort(batches)
        listing = FakeListing()
        rows = scroll_fetch(
            port, "http://x", max_stale_rounds=stale_budget, max_rounds=50
        )
        merged = scroll_harvest(
            listing, max_stale_rounds=stale_budget, max_rounds=50
        )
        assert "".join(h for _, h in rows) == merged[4:-5], stale_budget
        assert port.scrolls == listing.scrolls, stale_budget
