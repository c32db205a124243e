"""HTML main-content extraction (operators/html.py).

Crafted-page tests pin the extraction semantics: structural
boilerplate removal, comment/entity handling, block segmentation
with nesting, the link-density heuristic, and parser robustness on
the malformed HTML a real crawl serves.
"""

import pytest

from flytemosaic_spark.operators.html import extract_main_content


class TestExtraction:
    def test_basic_page(self):
        r = extract_main_content(
            "<html><head><title>T</title></head><body>"
            "<p>hello world</p><p>second para</p></body></html>"
        )
        assert r["title"] == "T"
        assert r["main_text"] == "hello world\nsecond para"
        assert r["n_kept"] == 2 and r["n_dropped"] == 0

    def test_boilerplate_subtrees_dropped(self):
        r = extract_main_content(
            "<body><nav><ul><li>Home</li><li>About</li></ul></nav>"
            "<p>content</p>"
            "<footer><p>copyright 2024</p></footer>"
            "<script>var x = '<p>not content</p>';</script></body>"
        )
        assert r["main_text"] == "content"
        # nav li text + footer p text counted as boilerplate
        assert r["boilerplate_chars"] > 0

    def test_entities_decoded(self):
        r = extract_main_content("<p>Tom &amp; Jerry &lt;3 &#65;</p>")
        assert r["main_text"] == "Tom & Jerry <3 A"

    def test_comments_ignored(self):
        r = extract_main_content("<p>a<!-- hidden <b>x</b> -->b</p>")
        assert r["main_text"] == "ab"

    def test_link_density_drops_nav_block(self):
        r = extract_main_content(
            '<p><a href="/a">prev</a> <a href="/b">next</a></p>'
            "<p>a real paragraph with one <a href='/r'>link</a> inside "
            "a lot of surrounding prose text</p>"
        )
        assert r["n_dropped"] == 1
        assert r["main_text"].startswith("a real paragraph")
        assert r["link_chars_dropped"] == len("prev") + len("next")

    def test_nested_blocks_count_once(self):
        r = extract_main_content(
            "<div>outer before <p>inner text</p> outer after</div>"
        )
        # inner <p> finalizes first but document order is preserved
        # by start order; each fragment appears exactly once
        assert r["main_text"].count("inner text") == 1
        assert r["main_text"].count("outer") == 2
        assert r["n_kept"] == 2

    def test_whitespace_normalized_per_block(self):
        r = extract_main_content("<p>  a\n\n  b\t c  </p>")
        assert r["main_text"] == "a b c"

    def test_br_is_a_space(self):
        r = extract_main_content("<p>line1<br>line2<br/>line3</p>")
        assert r["main_text"] == "line1 line2 line3"

    def test_unclosed_blocks_still_emit(self):
        r = extract_main_content("<p>first<p>second")
        assert "first" in r["main_text"] and "second" in r["main_text"]

    def test_text_outside_blocks_discarded(self):
        r = extract_main_content("stray <p>kept</p> tail")
        assert r["main_text"] == "kept"

    def test_uppercase_tags(self):
        r = extract_main_content("<P>Hello</P><SCRIPT>x</SCRIPT>")
        assert r["main_text"] == "Hello"

    def test_attribute_with_gt(self):
        r = extract_main_content('<p data-x="a>b">text</p>')
        assert r["main_text"] == "text"

    def test_empty_and_whitespace_blocks_ignored(self):
        r = extract_main_content("<p>   </p><p></p><p>x</p>")
        assert r["n_kept"] == 1 and r["n_dropped"] == 0

    def test_threshold_boundary_inclusive(self):
        # link share exactly at the threshold is KEPT (<=)
        r = extract_main_content(
            "<p><a>ab</a> cdef</p>", link_density_threshold=2 / 7
        )
        assert r["n_kept"] == 1

    def test_min_block_chars(self):
        r = extract_main_content("<p>ab</p><p>long enough</p>",
                                 min_block_chars=3)
        assert r["main_text"] == "long enough"
        assert r["n_dropped"] == 1

    def test_title_inside_head_with_script(self):
        r = extract_main_content(
            "<head><script>junk()</script><title>My Doc</title>"
            "<style>p{}</style></head><body><p>body</p></body>"
        )
        assert r["title"] == "My Doc"
        assert r["main_text"] == "body"


class TestSparkOperators:
    def test_html_extract_df(self, spark):
        from flytemosaic_spark.operators.html import html_extract

        df = spark.createDataFrame(
            [(1, "<title>t1</title><p>hello</p><nav>x</nav>"),
             (2, "<p><a>only links</a></p>")],
            "media_id long, html string",
        )
        rows = {r["media_id"]: r for r in html_extract(df).collect()}
        assert rows[1]["main_text"] == "hello"
        assert rows[1]["title"] == "t1"
        assert rows[2]["n_kept"] == 0 and rows[2]["n_dropped"] == 1

    def test_warc_pipeline(self, spark):
        from flytemosaic_spark.operators.html import (
            synthesize_warc_html,
            warc_html_main_stats,
        )

        keys = spark.range(0, 12).withColumnRenamed("id", "s_suppkey")
        out = warc_html_main_stats(synthesize_warc_html(keys)).collect()
        assert len(out) == 12
        for r in out:
            k = r["media_id"]
            n_ok = sum(
                1 for i in range(3 + k % 5) if (k + i) % 5 != 0
            )
            assert r["n_pages_ok"] == n_ok
            assert r["total_chars"] > 0


class TestWarcExtractPages:
    def test_page_rows_and_dedup_keys(self, spark):
        from pyspark.sql import functions as F

        from flytemosaic_spark.operators.html import (
            synthesize_warc_html,
            warc_extract_pages,
        )

        # page text is determined by (nj, (k*3 + i*5) % 30) — at most
        # 90 distinct classes, so 40 keys (~160 ok pages) guarantee
        # cross-file duplicates by pigeonhole
        keys = spark.range(0, 40).withColumnRenamed("id", "s_suppkey")
        pages = warc_extract_pages(synthesize_warc_html(keys))
        rows = pages.collect()
        for r in rows:
            k, i = r["media_id"], r["page_idx"]
            assert (k + i) % 5 != 0  # only 200-status pages emitted
            assert r["title"] == f"p{k}-{i}"
            nj = 2 + (k + i) % 3
            assert r["main_text"].count("\n") == nj - 1
        # duplicate texts exist across files by construction
        n_total = len(rows)
        n_distinct = (
            pages.select(F.md5("main_text")).distinct().count()
        )
        assert n_distinct < n_total


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="<>/abp &;#x\"'=!-\n\t", max_size=300))
def test_extractor_never_crashes_on_tag_soup(soup):
    # arbitrary malformed markup: the extractor must return a result,
    # never raise — a crawl pipeline cannot crash on one bad page
    r = extract_main_content(soup)
    assert isinstance(r["main_text"], str)
    assert r["n_kept"] >= 0 and r["n_dropped"] >= 0


@settings(max_examples=30, deadline=None)
@given(st.text(max_size=200))
def test_extractor_handles_arbitrary_unicode(body):
    r = extract_main_content(f"<p>{body.replace('<', ' ')}</p>")
    assert isinstance(r["main_text"], str)
