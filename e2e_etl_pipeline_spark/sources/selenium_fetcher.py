"""Optional live-browser fetcher implementing the reference's two
acquisition contracts behind the ``Fetcher`` protocol (sources/acquire.py).

The loops themselves are pure functions over a minimal page protocol so the
contracts are testable offline (tests/test_selenium_fetcher.py fakes the
page). Selenium itself is import-gated: this container has no Chrome, and
nothing else in the engine depends on it.

Reference contracts:
  * Pracuj page-loop (DataExtract/extract_data.py:108-146): per page collect
    the offer divs, then click "next" while the button is visible, bounded
    by ``max_rounds``; emit one merged ``<div>`` document.
  * JustJoinIT scroll-harvest (DataExtract/extract_data.py:199-246): the
    list virtualizes on scroll, so harvest ``li[data-index]`` keyed by
    data-index (first occurrence wins), scroll by 1200px, and stop after
    ``max_stale_rounds`` consecutive rounds with no progress — progress =
    the seen-count grew OR the max data-index grew; emit one merged
    ``<ul>`` with items ordered by integer data-index.

Relationship to sources/selenium_fetch.py (deliberate, not drift): this
module emits the reference-faithful MERGED single document per loop (the
A28 raw artifact); selenium_fetch.py emits one row per fragment for the
engine-native row-wise ingest. See that module's docstring for the
contract comparison.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Protocol


class PagedListing(Protocol):
    """What the page-loop needs from a browser page (Pracuj-shaped)."""

    def collect_offer_divs(self) -> list[str]: ...
    def is_next_visible(self) -> bool: ...
    def click_next(self) -> None: ...


class ScrollingListing(Protocol):
    """What the scroll-harvest needs from a browser page (JJIT-shaped)."""

    def visible_items(self) -> Iterable[tuple[str, str]]:
        """(data-index, outerHTML) for currently rendered list items."""
        ...

    def scroll_by(self, pixels: int) -> None: ...


def paginate_collect(page: PagedListing, max_rounds: int = 400) -> str:
    """Pracuj page-loop contract (extract_data.py:108-146)."""
    all_offers: list[str] = []
    for _ in range(max_rounds):
        all_offers.extend(page.collect_offer_divs())
        if not page.is_next_visible():
            break
        page.click_next()
    return "<div>" + "".join(all_offers) + "</div>"


def scroll_harvest(
    page: ScrollingListing,
    max_stale_rounds: int = 5,
    max_rounds: int = 400,
    scroll_px: int = 1200,
) -> str:
    """JJIT scroll-with-keyed-dedup contract (extract_data.py:199-246)."""
    seen: dict[str, str] = {}

    def harvest() -> None:
        for idx, html in page.visible_items():
            if idx is not None and idx not in seen:
                seen[idx] = html

    def max_idx() -> int:
        return max((int(k) for k in seen), default=-1)

    harvest()
    # Baseline AFTER the initial harvest (extract_data.py:218-223:
    # ``seen={}; _collect_visible_items(seen); last_count = len(seen);
    # last_max_idx = max(...)``): loop round 1 counts as progress only if
    # its own harvest adds items beyond the initial collect — the
    # reference's exact stale-round accounting. Baselining at 0/-1 instead
    # would grant every run one free round whenever the initial collect is
    # non-empty, changing the harvested artifact under a tight stale budget.
    stale_rounds = 0
    last_count = len(seen)
    last_max_idx = max_idx()
    for _ in range(max_rounds):
        harvest()
        progressed = len(seen) > last_count or max_idx() > last_max_idx
        stale_rounds = 0 if progressed else stale_rounds + 1
        if stale_rounds >= max_stale_rounds:
            break
        last_count, last_max_idx = len(seen), max_idx()
        page.scroll_by(scroll_px)
    body = "".join(seen[k] for k in sorted(seen, key=int))
    return "<ul>" + body + "</ul>"


def selenium_fetcher(site: str, region: str, experience: str) -> list[tuple[int, str]]:
    """``Fetcher``-protocol adapter driving a real headless Chrome.

    Only importable where selenium + a Chrome binary exist; everywhere else
    the engine's default ``synthetic_fetcher`` stands in (acquire.py). URL
    shapes follow the reference (extract_data.py:74-79, 163-167).
    """
    try:
        from selenium import webdriver
        from selenium.webdriver.chrome.options import Options
    except ImportError as exc:  # pragma: no cover - absent in this container
        raise RuntimeError(
            "selenium_fetcher requires the optional selenium dependency; "
            "use sources.acquire.synthetic_fetcher offline"
        ) from exc

    opts = Options()
    opts.add_argument("--headless=new")
    driver = webdriver.Chrome(options=opts)
    try:
        if site == "jjit":
            url = (
                f"https://justjoin.it/job-offers/{region}"
                f"?experience-level={experience}&with-salary=yes"
            )
            driver.get(url)
            page = _SeleniumScrollingListing(driver)
            return [(0, scroll_harvest(page))]
        url = (
            f"https://it.pracuj.pl/praca/{region};wp"
            f"?et={experience}&sal=1"
        )
        driver.get(url)
        return [(0, paginate_collect(_SeleniumPagedListing(driver)))]
    finally:
        driver.quit()


class _SeleniumPagedListing:  # pragma: no cover - needs a live browser
    """Pracuj DOM bindings for ``paginate_collect`` (extract_data.py:84-106)."""

    def __init__(self, driver) -> None:
        self._driver = driver

    def collect_offer_divs(self) -> list[str]:
        return self._driver.execute_script(
            "return Array.from(document.querySelectorAll("
            "\"[data-test='section-offers'] [data-test='default-offer']\""
            ")).map(d => d.outerHTML);"
        )

    def is_next_visible(self) -> bool:
        els = self._driver.find_elements(
            "css selector", "[data-test='bottom-pagination-button-next']"
        )
        return bool(els) and els[0].is_displayed()

    def click_next(self) -> None:
        el = self._driver.find_element(
            "css selector", "[data-test='bottom-pagination-button-next']"
        )
        self._driver.execute_script(
            "arguments[0].scrollIntoView({block: 'center'});", el
        )
        el.click()


class _SeleniumScrollingListing:  # pragma: no cover - needs a live browser
    """JJIT DOM bindings for ``scroll_harvest`` (extract_data.py:181-192)."""

    def __init__(self, driver) -> None:
        self._driver = driver

    def visible_items(self) -> list[tuple[str, str]]:
        rows = self._driver.execute_script(
            "return Array.from(document.querySelectorAll("
            "'#up-offers-list ul li[data-index]'"
            ")).map(li => [li.getAttribute('data-index'), li.outerHTML]);"
        )
        return [(idx, html) for idx, html in rows]

    def scroll_by(self, pixels: int) -> None:
        self._driver.execute_script(f"window.scrollBy(0, {pixels});")
