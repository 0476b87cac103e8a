"""Excel grid-repair + year-sheet + HTML loader tests (offline: pre-parsed
grids injected; mirrors reference excel.py/html.py behaviors, SURVEY §2.1)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from openpolicedata_spark.sources.excel import (
    ExcelLoader,
    detect_year_sheets,
    reconcile_columns,
    repair_sheet,
)
from openpolicedata_spark.sources.html import HtmlLoader


def _grid(rows):
    return pd.DataFrame(rows)


def test_repair_title_row_and_single_header():
    raw = _grid([
        ["Use of Force Report", None, None],
        ["Case", "Date", "Officer"],
        ["C1", "2020-01-01", "Smith"],
        ["C2", "2020-02-01", "Jones"],
    ])
    out = repair_sheet(raw)
    assert list(out.columns) == ["Case", "Date", "Officer"]
    assert len(out) == 2


def test_repair_merged_two_row_header():
    # merged parent 'Subject' spans two child columns (NaN under the span)
    raw = _grid([
        ["Case", "Subject", None, "Officer"],
        [None, "Race", "Sex", "Race"],
        ["C1", "WHITE", "M", "BLACK"],
    ])
    out = repair_sheet(raw)
    assert list(out.columns) == ["Case", "Subject Race", "Subject Sex", "Officer Race"]
    assert out.iloc[0].tolist() == ["C1", "WHITE", "M", "BLACK"]


def test_repair_repeated_headers_and_footers():
    raw = _grid([
        ["Case", "Date"],
        ["C1", "2020-01-01"],
        ["Case", "Date"],          # repeated page header
        ["C2", "2020-02-01"],
        [None, None],              # trailing blank
        ["Total: 2", None],        # footer (>75% null? 50%... only_num? no)
    ])
    out = repair_sheet(raw)
    assert out["Case"].tolist()[:2] == ["C1", "C2"]
    assert "Case" not in out["Case"].tolist()


def test_detect_year_sheets_with_typo():
    assert detect_year_sheets(["2019", "2020", "2104"]) == {
        "2019": 2019, "2020": 2020, "2104": 2014}
    assert detect_year_sheets(["2019", "Notes"]) is None


def test_reconcile_columns_fuzzy():
    frames = {
        "2019": pd.DataFrame({"Officer Race": ["A"], "Case Number": ["1"]}),
        "2020": pd.DataFrame({"Officer Race ": ["B"], "Case Nmber": ["2"]}),
    }
    out = reconcile_columns(frames)
    assert list(out["2020"].columns) == ["Officer Race", "Case Number"]


def test_excel_loader_year_sheets_union_and_filter(spark):
    sheets = {
        "2019": _grid([["Case", "Amount"], ["A1", "10"], ["A2", "20"]]),
        "2020": _grid([["Case", "Amont"], ["B1", "30"]]),  # typo'd column
    }
    loader = ExcelLoader(spark, url="fake.xlsx", sheets=sheets)
    df = loader.load()
    assert df.count() == 3
    assert set(df.columns) == {"Case", "Amount", "Year"}
    df20 = loader.load(2020)
    assert [r.Case for r in df20.collect()] == ["B1"]
    assert loader.get_count(2019, force=True) == 2


def test_html_loader(spark):
    t = pd.DataFrame({"case": ["C1", "C2", "C3"],
                      "agency": ["X PD", "Y PD", "X PD"]})
    loader = HtmlLoader(spark, url="http://fake", agency_field="agency",
                        tables=[t])
    assert loader.load().count() == 3
    assert loader.load(agency="X PD").count() == 2
    with pytest.raises(ValueError, match="exactly 1"):
        HtmlLoader(spark, url="u", tables=[t, t]).load()


def test_excel_loader_xls_error_paths(spark, tmp_path):
    # .xlsx no longer needs openpyxl (stdlib zip+XML reader); a missing
    # file surfaces as FileNotFoundError from the real parse path.
    with pytest.raises(FileNotFoundError):
        ExcelLoader(spark, url="nope.xlsx").load()
    # legacy .xls now parses via the stdlib BIFF8 reader (sources/xls.py);
    # junk inside the Workbook stream must surface as a clean XlsError —
    # never a raw struct.error (reference analog: excel.py:128 wraps
    # XLRDError)
    from openpolicedata_spark.sources.xls import XlsError
    from tests.test_msoffice_crypto import write_cfb

    xls = tmp_path / "legacy.xls"
    xls.write_bytes(write_cfb({"Workbook": b"\x09\x08" + bytes(30)}))
    with pytest.raises(XlsError):
        ExcelLoader(spark, url=str(xls)).load()
    # a CFB container that is not a workbook at all → clean XlsError too
    other = tmp_path / "notawb.xls"
    other.write_bytes(write_cfb({"SomeOtherStream": bytes(16)}))
    with pytest.raises(XlsError, match="no BIFF Workbook stream"):
        ExcelLoader(spark, url=str(other)).load()


def test_maybe_decrypt_passthrough_without_codec(tmp_path):
    """Without msoffcrypto installed the decrypt hook passes plain
    (non-CFB) content through untouched — path or buffer."""
    import io

    from openpolicedata_spark.sources.excel import ExcelLoader

    try:
        import msoffcrypto  # noqa: F401
        # codec present (not in this container): behavior covered upstream
    except ImportError:
        buf = io.BytesIO(b"PK\x03\x04 plain zip bytes")
        assert ExcelLoader._maybe_decrypt(buf) is buf
        assert buf.tell() == 0  # sniff must rewind
        p = tmp_path / "plain.xlsx"
        p.write_bytes(b"PK\x03\x04 plain zip bytes")
        assert ExcelLoader._maybe_decrypt(str(p)) == str(p)


class TestHtmlToText:
    def test_skip_regions_blocks_entities(self):
        from openpolicedata_spark.sources.htmltable import html_to_text

        h = ('<HTML><head><title>skip</title>'
             '<script>var x = "<p>not text</p>";</script>'
             '<style>.c{color:red}</style></head>'
             '<body><h1> Big   Title </h1>'
             '<p>para &amp; <b>bold</b> tail</p><!-- gone -->'
             '<div><div>nested</div>rest</div>after<br/>line</body>')
        assert html_to_text(h) == \
            "Big Title\npara & bold tail\nnested\nrest\nafter\nline"
        # numeric + named entities, list items as blocks
        assert html_to_text("<p>a&lt;b &#65;</p><ul><li>x</li><li>y</li>"
                            "</ul>") == "a<b A\nx\ny"
        # no tags at all: the whole input is one block
        assert html_to_text("  plain   text  ") == "plain text"
        assert html_to_text("") == ""

    def test_ascii_whitespace_only_collapse(self):
        # ADVICE r8: collapse must use the ASCII class, matching the
        # q176 oracle's RE2 '\s+' (and Spark's Java '\s') — NBSP and
        # other Unicode whitespace are CONTENT, not separators.
        from openpolicedata_spark.sources.htmltable import html_to_text

        assert html_to_text("<p>a\xa0b</p>") == "a\xa0b"
        assert html_to_text("<p> a \xa0 b </p>") == "a \xa0 b"
        assert html_to_text("<p>x y\x85z</p>") == "x y\x85z"
        # &nbsp; decodes to \xa0 and survives as content too
        assert html_to_text("<p>a&nbsp;b</p>") == "a\xa0b"
        # a block of ONLY Unicode whitespace is a (non-empty) block
        assert html_to_text("<p>\xa0</p><p>t</p>") == "\xa0\nt"
        # HTML5 ASCII whitespace collapses; \v does NOT (review r9:
        # RE2's \s — the q176 oracle — excludes it, and so does the
        # HTML5 "ASCII whitespace" definition)
        assert html_to_text("<p>a \t\r\n\f b</p>") == "a b"
        assert html_to_text("<p>a\x0bb</p>") == "a\x0bb"
        assert html_to_text("<p> \x0b </p>") == "\x0b"

    def test_tolerates_malformed_markup(self):
        from openpolicedata_spark.sources.htmltable import html_to_text

        # unclosed tags, stray '>', attribute junk, uppercase tags
        h = ('<DIV class="a" data-x=">">one<P>two'
             '<span>three</div>')
        out = html_to_text(h)
        # inline tags with no surrounding whitespace do NOT introduce a
        # word break (browser semantics: "two<span>three" -> "twothree")
        assert out == "one\ntwothree"
        # unclosed script at EOF swallows the rest (skip region) but
        # earlier blocks survive
        assert html_to_text("<p>kept</p><script>var a=1;") == "kept"
        # nested svg/iframe content is dropped
        assert html_to_text("<p>k</p><svg><text>no</text></svg>"
                            "<iframe>no</iframe><p>k2</p>") == "k\nk2"

    def test_extract_operator_nulls_and_counts(self, spark):
        from openpolicedata_spark.operators.textpipe import (
            extract_html_text,
        )

        df = spark.createDataFrame(
            [(1, "<p>a</p><p>b</p>"), (2, None), (3, "<script>x</script>")],
            "doc_id long, html string")
        out = {r.doc_id: r for r in extract_html_text(df).collect()}
        assert out[1].text == "a\nb" and out[1].n_blocks == 2
        assert out[2].text is None and out[2].n_blocks is None
        assert out[3].text == "" and out[3].n_blocks == 0

        # non-long id columns keep their TYPE in the output schema
        # (ADVICE r8: the hardcoded `long` failed Arrow conversion)
        df2 = spark.createDataFrame([("u-1", "<p>hi</p>")],
                                    "url string, html string")
        got = extract_html_text(df2, id_col="url").collect()
        assert got[0].url == "u-1" and got[0].text == "hi"


# ---- adversarial html_to_text fuzz (round-9 verdict item 4) ----

from hypothesis import given, settings, strategies as hst  # noqa: E402

_SOUP_ATOMS = [
    "<script>", "</script>", "<SCRIPT >", "<style>", "</style>",
    "<p>", "</p>", "<P>", "<div ", "<div>", "</div>", "<br/>", "<br>",
    "<iframe>", "</iframe>", "<svg>", "</svg>", "<head>", "</head>",
    "<table><tr><td>", "</td></tr></table>", "<li>", "</li>",
    "<!--", "-->", "<!-- <p>x</p> -->", "<![CDATA[", "]]>", "<!",
    "<![", "<!DOCTYPE html>", "<?php echo ?>", "<", ">", "</", "/>",
    "&", "&#", "&#x", "&#x41;", "&#65;", "&amp", "&amp;", "&nbsp;",
    "&notanentity;", "&#xZZ;", "&#999999999;", "< p>", "</ p>", "<p",
    'attr="unclosed', "'", '"', "\x00", "\xa0", "\x0b", " ",
]


@settings(max_examples=300, deadline=None)
@given(hst.lists(
    hst.one_of(hst.sampled_from(_SOUP_ATOMS),
               hst.text(max_size=12)),
    max_size=25).map("".join))
def test_html_to_text_tag_soup_fuzz(soup):
    """Adversarial tag soup — unclosed scripts/styles, overlapping
    blocks, truncated entities, comments containing tags, CDATA,
    NULs, Unicode whitespace: html_to_text must (a) never raise,
    (b) emit only non-empty blocks, (c) be a fixpoint of its OWN
    whitespace collapse (no ASCII-whitespace runs, no edge
    whitespace per block — so re-collapsing changes nothing)."""
    import re

    from openpolicedata_spark.sources.htmltable import html_to_text

    out = html_to_text(soup)
    assert isinstance(out, str)
    for block in out.split("\n") if out else []:
        assert block != ""
        # ASCII-collapse fixpoint: single spaces only, no edge HTML5
        # whitespace (a plain .strip() here would be wrong — it strips
        # UNICODE whitespace like \x85 and \v, which are deliberately
        # content; the class below is the extractor's own)
        assert re.sub("[ \t\n\r\f]+", " ", block) == block
        assert not block.startswith(" ") and not block.endswith(" ")
