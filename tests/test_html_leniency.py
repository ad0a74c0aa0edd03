"""Leniency parity between the engine's stdlib-html.parser DOM walk and the
reference's BeautifulSoup+lxml (DataTransform/transform_data.py:88,184).

bs4/lxml are not in this container, so this suite does two things instead:

1. PINS the recovery behaviors the engine deliberately reproduces from
   lxml's error model (implied element closes, truncated-document flush,
   nested-inline text accumulation, stray end tags, markup sloppiness the
   stdlib tokenizer already absorbs).
2. DOCUMENTS the remaining known divergences as executable facts — each
   test asserts the ENGINE's current deterministic output and names what
   lxml/bs4 would produce instead, so a future fixture regression is caught
   and the delta is auditable rather than folklore.

If lxml ever lands in the container, `test_lxml_cross_check` upgrades from
skip to a live comparison.
"""

from __future__ import annotations

import pytest

from e2e_etl_pipeline_spark.pipeline.offers import _JJITParser, _PracujParser


def _jjit(html: str) -> list[dict]:
    p = _JJITParser()
    p.feed(html)
    p.close()
    return p.offers


def _ppl(html: str) -> list[dict]:
    p = _PracujParser()
    p.feed(html)
    p.close()
    return p.offers


# ---------------------------------------------------------------------------
# lxml-parity recoveries (engine matches the reference parser's behavior)
# ---------------------------------------------------------------------------
def test_jjit_implied_li_close_keeps_both_offers():
    """lxml auto-closes an open <li> when a sibling <li> starts; the engine
    must not swallow the unclosed predecessor."""
    html = (
        "<ul><li data-index='0'><h3>First Dev</h3>"  # no </li>
        "<li data-index='1'><h3>Second Dev</h3></li></ul>"
    )
    offers = _jjit(html)
    assert [o["position_raw"] for o in offers] == ["First Dev", "Second Dev"]
    assert [o["offer_idx"] for o in offers] == [0, 1]


def test_jjit_truncated_document_flushes_last_offer():
    """A document cut off mid-item (network truncation) still yields the
    partial offer, as lxml's recovery does."""
    html = "<ul><li data-index='7'><h3>Cut Off Dev</h3><h6><span>10</span>"
    offers = _jjit(html)
    assert len(offers) == 1
    assert offers[0]["offer_idx"] == 7
    assert offers[0]["position_raw"] == "Cut Off Dev"


def test_jjit_nested_inline_markup_inside_h3_accumulates():
    """<b>/<em> inside the position heading contribute their text exactly
    like bs4's get_text()."""
    html = "<ul><li data-index='0'><h3>Senior <b>Python</b> Dev</h3></li></ul>"
    assert _jjit(html)[0]["position_raw"] == "Senior Python Dev"


def test_jjit_stray_end_tags_are_ignored():
    html = "</li></span><ul><li data-index='0'><h3>Dev</h3></li></ul></li>"
    offers = _jjit(html)
    assert [o["position_raw"] for o in offers] == ["Dev"]


def test_ppl_nested_inline_markup_inside_field_accumulates():
    """Nested inline close must not truncate the captured field (bs4
    get_text parity over the selected node)."""
    html = (
        "<div data-test='default-offer'>"
        "<a data-test='link-offer-title'>Senior <b>Python</b> Dev</a>"
        "<h3 data-test='text-company-name'>Acme</h3>"
        "</div></html>"
    )
    o = _ppl(html)[0]
    assert o["position_raw"] == "Senior Python Dev"
    assert o["company_raw"] == "Acme"


def test_ppl_unclosed_offer_div_flushes_on_close():
    html = (
        "<div data-test='default-offer'>"
        "<a data-test='link-offer-title'>Dev</a>"
    )
    offers = _ppl(html)
    assert len(offers) == 1 and offers[0]["position_raw"] == "Dev"


def test_tokenizer_sloppiness_mostly_absorbed():
    """Unquoted attributes and uppercase tags normalize identically in both
    tokenizers. DIVERGENCE on duplicated attributes: the engine's
    dict(attrs) keeps the LAST occurrence, lxml keeps the FIRST — pinned
    here; real listings never duplicate data-index."""
    html = "<UL><LI DATA-INDEX=3 data-index=9><H3>Dev</H3></LI></UL>"
    offers = _jjit(html)
    assert offers[0]["offer_idx"] == 9  # lxml would say 3
    assert offers[0]["position_raw"] == "Dev"


# ---------------------------------------------------------------------------
# Documented divergences (engine behavior asserted; lxml's noted)
# ---------------------------------------------------------------------------
def test_divergence_jjit_span_inside_h3_becomes_salary_span():
    """DIVERGENCE: a <span> nested inside <h3> switches capture to the
    salary-span channel, so the h3 tail after </span> is dropped and the
    span text registers as a salary fragment. bs4's selector-scoped
    get_text() would keep 'Dev (remote) Senior' as the position and no
    salary. The live JJIT DOM never nests salary spans inside h3 (they sit
    in h6 — transform_data.py:91-107), so the engine accepts this
    divergence; this test pins it so any change is deliberate."""
    html = (
        "<ul><li data-index='0'>"
        "<h3>Dev <span>(remote)</span> Senior</h3></li></ul>"
    )
    o = _jjit(html)[0]
    assert o["position_raw"] == "Dev "
    assert o["salary_raw"] == "(remote)"


def test_divergence_ppl_unclosed_field_leaks_until_next_field():
    """DIVERGENCE: an unclosed captured element keeps capturing following
    text until the next field starts (lxml would imply a close at the block
    boundary). Only reachable on malformed documents; pinned here."""
    html = (
        "<div data-test='default-offer'>"
        "<a data-test='link-offer-title'>Dev"  # never closed
        "<p>stray paragraph</p>"
        "<h3 data-test='text-company-name'>Acme</h3>"
        "</div></html>"
    )
    o = _ppl(html)[0]
    assert o["position_raw"] == "Devstray paragraph"
    assert o["company_raw"] == "Acme"


def test_divergence_comment_like_markup():
    """DIVERGENCE CLASS (documented, vacuously equal here): html.parser and
    lxml differ on exotic markup-declaration recovery (e.g. `<!-->`,
    conditional comments). The engine's selectors never match inside
    comments, so both parsers drop them; pinned with a representative."""
    html = "<ul><!--><li data-index='0'--><li data-index='1'><h3>D</h3></li></ul>"
    offers = _jjit(html)
    # html.parser treats `<!-->` as a (bogus) comment and swallows up to the
    # next `-->`, so ONLY index 1 survives; lxml agrees on this input.
    assert [o["offer_idx"] for o in offers] == [1]


def test_lxml_cross_check():
    """Live cross-check — runs only if the container ever gains lxml."""
    pytest.importorskip("lxml")
    import lxml.html  # noqa: F401

    html = "<ul><li data-index='0'><h3>First</h3><li data-index='1'><h3>Second</h3></li></ul>"
    tree = lxml.html.fromstring(html)
    # xpath, not cssselect: lxml elements always expose .cssselect but it
    # raises ImportError at CALL time when the separate cssselect package
    # is absent — xpath needs nothing extra.
    lis = tree.xpath("//li[@data-index]")
    got = _jjit(html)
    assert len(got) == len(lis) == 2


def test_ppl_unclosed_field_does_not_leak_into_next_offer():
    """A new offer div implies a close of any still-capturing field from
    the previous offer (lxml block-boundary recovery) — cross-offer text
    leakage would corrupt a neighbor's record, unlike the pinned
    within-offer leak."""
    html = (
        "<div data-test='default-offer'>"
        "<a data-test='link-offer-title'>Dev</div>leak"
        "<div data-test='default-offer'>stray"
        "<a data-test='link-offer-title'>Second</a></div></html>"
    )
    offers = _ppl(html)
    assert [o["position_raw"] for o in offers] == ["Devleak", "Second"]


def test_ppl_same_tag_nested_inside_field_accumulates():
    """Pracuj salary nodes nest <span> inside <span>; depth counting keeps
    the outer capture open across the nested close (bs4 get_text parity —
    without it the field truncated at the inner </span>)."""
    html = (
        "<div data-test='default-offer'>"
        "<span data-test='offer-salary'>10 000 <span>–</span> 12 000 PLN</span>"
        "<a data-test='link-offer-title'>Dev</a>"
        "</div></html>"
    )
    o = _ppl(html)[0]
    assert o["salary_raw"] == "10 000 – 12 000 PLN"
    assert o["position_raw"] == "Dev"
