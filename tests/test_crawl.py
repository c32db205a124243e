"""Crawl-politeness + charset stages (operators/crawl.py)."""

import pytest

from flytemosaic_spark.operators.crawl import (
    crawl_delay,
    robots_allowed,
    sniff_and_decode,
)


class TestRobots:
    def test_disallow_prefix(self):
        robots = "User-agent: *\nDisallow: /private/\n"
        got = robots_allowed(
            robots, ["/private/a", "/public/a", "/privateer"]
        )
        assert got == [False, True, True]

    def test_agent_specific_rules_win(self):
        robots = (
            "User-agent: badbot\nDisallow: /\n\n"
            "User-agent: *\nDisallow: /secret/\n"
        )
        assert robots_allowed(robots, ["/x"], agent="badbot") == [False]
        assert robots_allowed(robots, ["/x"], agent="goodbot") == [True]
        assert robots_allowed(robots, ["/secret/x"],
                              agent="goodbot") == [False]

    def test_crawl_delay(self):
        assert crawl_delay("User-agent: *\nCrawl-delay: 4\n") == 4
        assert crawl_delay("User-agent: *\nDisallow:\n") is None

    def test_empty_robots_allows_everything(self):
        assert robots_allowed("", ["/anything"]) == [True]


class TestCharset:
    def test_bom_utf16_le(self):
        cs, t = sniff_and_decode(b"\xff\xfe" + "hi中".encode("utf-16-le"))
        assert cs == "utf-16-le" and t == "hi中"

    def test_bom_utf16_be(self):
        cs, t = sniff_and_decode(b"\xfe\xff" + "hi".encode("utf-16-be"))
        assert cs == "utf-16-be" and t == "hi"

    def test_bom_utf8(self):
        cs, t = sniff_and_decode(b"\xef\xbb\xbfcaf\xc3\xa9")
        assert cs == "utf-8-sig" and t == "café"

    def test_meta_declared(self):
        cs, t = sniff_and_decode(
            b'<meta charset="iso-8859-1">caf\xe9'
        )
        assert cs == "iso-8859-1" and t.endswith("café")

    def test_meta_declared_with_http_equiv_style(self):
        cs, _ = sniff_and_decode(
            b"<meta http-equiv='Content-Type' "
            b"content='text/html; charset=UTF-8'>ok"
        )
        assert cs == "utf-8"

    def test_lying_meta_falls_back(self):
        # declares utf-16-le but the bytes are not decodable as such
        # at odd length -> falls through to utf-8/latin-1
        payload = b'<meta charset="utf-16-le">abc'
        cs, t = sniff_and_decode(payload)
        assert cs in ("utf-8", "latin-1")
        assert "abc" in t

    def test_plain_utf8_no_declaration(self):
        cs, t = sniff_and_decode("中文 text".encode("utf-8"))
        assert cs == "utf-8" and t == "中文 text"

    def test_binary_garbage_never_fails(self):
        cs, t = sniff_and_decode(bytes(range(256)))
        assert cs == "latin-1" and len(t) == 256


class TestSparkOps:
    def test_robots_scan(self, spark):
        from flytemosaic_spark.operators.crawl import (
            robots_scan,
            synthesize_robots,
        )

        keys = spark.range(0, 15).withColumnRenamed("id", "s_suppkey")
        out = {r["media_id"]: r
               for r in robots_scan(synthesize_robots(keys)).collect()}
        for k in range(15):
            n = 4 + k % 5
            want = sum((k + i) % 4 != k % 3 for i in range(n))
            assert out[k]["n_allowed"] == want
            assert out[k]["delay_s"] == 1 + k % 7

    def test_charset_stats(self, spark):
        from flytemosaic_spark.operators.crawl import (
            charset_decode_stats,
            synthesize_charset_docs,
        )

        keys = spark.range(0, 8).withColumnRenamed("id", "s_suppkey")
        out = {
            r["media_id"]: r
            for r in charset_decode_stats(
                synthesize_charset_docs(keys)
            ).collect()
        }
        assert out[2]["charset"] == "utf-16-le"
        assert out[1]["charset"] == "iso-8859-1"
        # cp sums include the non-ascii char exactly once
        s0 = '<meta charset="utf-8">charset test ' + "a" * 5 + "中"
        assert out[0]["cp_sum"] == sum(ord(c) for c in s0)


class TestQualityClassifier:
    def test_learns_separable_labels(self, spark):
        from pyspark.sql import functions as F

        from flytemosaic_spark.operators.linear import logreg_train_gd

        # strongly separable by flen: y = 1 iff flen > 1.0
        rows = [
            (float(i % 4) / 10, 0.2, 0.3, 0.4 + (i % 2) * 1.2,
             1.0 if 0.4 + (i % 2) * 1.2 > 1.0 else 0.0)
            for i in range(200)
        ]
        df = spark.createDataFrame(
            rows, "f0 double, f1 double, f2 double, flen double, y double"
        )
        w = logreg_train_gd(
            df, ["f0", "f1", "f2", "flen"], label_col="y", lr=0.5,
            iterations=6,
        ).collect()[0]
        # score the training frame with the returned weights
        correct = 0
        for f0, f1, f2, flen, y in rows:
            z = (w["w_f0"] * f0 + w["w_f1"] * f1 + w["w_f2"] * f2
                 + w["w_flen"] * flen + w["w_bias"])
            pred = 1.0 if (0.5 + z / (2 * (1 + abs(z)))) >= 0.5 else 0.0
            correct += pred == y
        assert correct / len(rows) >= 0.95

    def test_probe_weights_move_toward_length_signal(self, spark):
        from flytemosaic_spark.probes import all_probes

        w = (
            all_probes()["x247_quality_classifier"]
            .fn(spark, "/root/testdata/sf0.001")
            .collect()[0]
        )
        # labels are (n_chars >= 250): the token-count feature must
        # carry positive weight after training
        assert w["w_flen"] > 0
        assert w["n"] > 0


class TestNormalizeText:
    """Unicode hygiene (crawl.normalize_text): composed/decomposed
    twins become byte-identical, invisibles strip, whitespace
    collapses — and md5-based dedup only works AFTER the stage."""

    def test_composed_decomposed_dedup_only_after_normalize(self, spark):
        from pyspark.sql import functions as F

        from flytemosaic_spark.operators.crawl import normalize_text

        rows = [
            (1, "caf\u00e9 au lait"),            # composed e-acute
            (2, "cafe\u0301 au lait"),           # decomposed twin
            (3, "caf\u00e9\u200b au lait"),      # + zero-width space
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        raw = df.select(F.md5(F.col("text").cast("binary")).alias("h"))
        assert raw.distinct().count() == 3  # raw md5 splits the twins
        out = normalize_text(df)
        norm = out.select(
            F.md5(F.col("norm_text").cast("binary")).alias("h")
        )
        assert norm.distinct().count() == 1  # normalized: one content key

    def test_strip_and_collapse(self, spark):
        from flytemosaic_spark.operators.crawl import normalize_text

        rows = [
            (1, "  a\tb\r\nc   d  "),
            (2, "x\u00ady\u2060z\ufeff"),
            (3, "ctrl\x01\x02\x7fchars"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["norm_text"]
            for r in normalize_text(df).collect()
        }
        assert got == {1: "a b c d", 2: "xyz", 3: "ctrlchars"}

    def test_nfkc_variant_folds_compatibility(self, spark):
        from flytemosaic_spark.operators.crawl import normalize_text

        df = spark.createDataFrame(
            [(1, "\ufb01le \u2460")], "doc_id long, text string"
        )  # fi-ligature + circled one
        nfc = normalize_text(df, form="NFC").collect()[0]["norm_text"]
        nfkc = normalize_text(df, form="NFKC").collect()[0]["norm_text"]
        assert nfc == "\ufb01le \u2460"
        assert nfkc == "file 1"

    def test_bad_form_raises(self, spark):
        import pytest as _pt

        from flytemosaic_spark.operators.crawl import normalize_text

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with _pt.raises(ValueError, match="normalization form"):
            normalize_text(df, form="NFX")


class TestFrontierSchedule:
    def _run(self, spark, urls, robots_txt, batch=2):
        from flytemosaic_spark.operators.crawl import frontier_schedule

        u = spark.createDataFrame(
            [("h0", p) for p in urls], "host string, url string"
        )
        r = spark.createDataFrame(
            [("h0", robots_txt)], "host string, robots_txt string"
        )
        return {
            r_["url"]: (r_["seq"], r_["wave"], r_["eta_s"])
            for r_ in frontier_schedule(u, r, batch_size=batch).collect()
        }

    def test_waves_and_eta(self, spark):
        robots = "User-agent: *\nDisallow: /x/\nCrawl-delay: 3\n"
        urls = [f"/a/p{i}" for i in range(5)] + ["/x/blocked"]
        got = self._run(spark, urls, robots, batch=2)
        assert "/x/blocked" not in got
        # url-sorted: /a/p0../a/p4 -> seq 0..4, waves 0,0,1,1,2
        assert got["/a/p0"] == (0, 0, 0)
        assert got["/a/p1"] == (1, 0, 3)
        assert got["/a/p2"] == (2, 1, 6)
        assert got["/a/p4"] == (4, 2, 12)
        # ceil(5 / 2) = 3 waves
        assert len({w for _, w, _ in got.values()}) == 3

    def test_no_delay_means_zero_eta(self, spark):
        robots = "User-agent: *\n"
        got = self._run(spark, ["/a", "/b"], robots, batch=4)
        assert got["/a"] == (0, 0, 0) and got["/b"] == (1, 0, 0)

    def test_deterministic_reruns(self, spark):
        robots = "User-agent: *\nCrawl-delay: 1\n"
        urls = [f"/p{i}" for i in range(7)]
        a = self._run(spark, urls, robots)
        b = self._run(spark, list(reversed(urls)), robots)
        assert a == b  # input order never changes the schedule


class TestMultiformatRouter:
    def test_routes_html_and_pdf_skips_others(self, spark):
        from flytemosaic_spark.operators.html import (
            warc_multiformat_pages,
        )
        from flytemosaic_spark.sources.pdf import encode_pdf
        from flytemosaic_spark.sources.warc import write_warc

        html = b"<html><body><p>hello paragraph one two</p></body></html>"
        pdf = encode_pdf([["pdf line one", "pdf line two"]])
        shard = write_warc(
            [
                ("https://x/1", 200, html),
                ("https://x/2.pdf", 200, pdf, "application/pdf"),
                ("https://x/3.jpg", 200, b"\xff\xd8\xff", "image/jpeg"),
                ("https://x/4", 404, html),
                # charset parameter must not break the router
                ("https://x/5", 200, html, "text/html; charset=utf-8"),
            ]
        )
        df = spark.createDataFrame(
            [(1, bytearray(shard))], "media_id long, payload binary"
        )
        rows = sorted(
            (r["rec_idx"], r["fmt"], r["text"])
            for r in warc_multiformat_pages(df).collect()
        )
        assert [(i, f) for i, f, _ in rows] == [
            (0, "html"), (1, "pdf"), (4, "html")
        ]
        assert rows[1][2] == "pdf line one\npdf line two"
        assert "hello paragraph one two" in rows[0][2]
