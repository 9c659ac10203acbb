"""HTML→text extraction + C4 line-rule goldens (VERDICT r7 Next #3).

Messy-HTML goldens on crafted strings (nested tags, entities, unclosed
markup, multi-line scripts/comments) plus cross-engine equivalence of
the shared SQL templates and plan-shape pins (map-only, no UDF, no
Exchange). Semantics: Raffel et al. 2020 (C4 §2.2), Penedo et al. 2023
(RefinedWeb).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from pgferry_spark.operators import html as H


def _spark_strip(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "html: string")
    return (
        H.html_strip_column(df, "html", "x").select("x").first()["x"]
    )


def _duck_strip(s: str) -> str:
    # the one-shot form nests past DuckDB's 128-deep binder cap, so the
    # oracle side always uses the staged CTE chain (round 9)
    ctes, final = H.html_strip_ctes("src", "html", "html")
    return duckdb.sql(
        f"WITH src AS (SELECT ? AS html){ctes}"
        f" SELECT clean_text FROM {final}",
        params=[s],
    ).fetchone()[0]


GOLDENS = [
    # nested tags
    ("<div><p>Nested <b><i>deep</i></b> text.</p></div>", "Nested deep text."),
    # entities, amp last (no double-decode)
    (
        "Fish &amp; chips &lt;b&gt; &quot;q&quot; &#39;s&#39; A&nbsp;B &amp;lt;",
        "Fish & chips <b> \"q\" 's' A B &lt;",
    ),
    # unclosed trailing markup
    ("Before the break.<div class=", "Before the break."),
    # multi-line script + style + comment all removed
    (
        "<script>\nvar a = '<p>';\n</script>keep<style>\np {}\n</style>"
        "<!-- c\nc -->me",
        "keep me",
    ),
    # attributes and whitespace-in-close-tag tolerated
    ("<a href=\"x?y=1&amp;z=2\">link</a >done.", "link done."),
    # blank-line squeeze + end trim
    ("<p>a.</p>\n\n\n<p>b.</p>\n", "a.\nb."),
    # CRLF and stray CR fold into LF (crawl line endings)
    ("<p>one.</p>\r\n<p>two.</p>\rthree.", "one.\ntwo.\nthree."),
    # numeric references decode (round 9, VERDICT r8 Next #2): decimal,
    # hex both digit-cases, &#39;, and the punctuation table
    ("A&apos;s &#60;dec&#62; text.", "A's <dec> text."),
    ("Hex &#x3c;x&#x3C;X&#x3E; and &#x41;&#x61;.", "Hex <x<X> and Aa."),
    ("It&#39;s Don&#8217;t &#8211; &#8230; &#169; &#xa9;.",
     "It's Don’t – … © ©."),
    ("A&#160;B &#xA0;C.", "A B C."),  # nbsp forms -> space, ws-squeezed
    # amp-producers decode in ONE single-pass regexp: no double-decode
    # in any spelling
    ("&#38;lt; &#x26;gt; &amp;#60; stay.", "&lt; &gt; &#60; stay."),
    # round-9 ADVICE goldens: double-encoded refs decode EXACTLY once —
    # '&#38;amp;' must NOT collapse to '&' (the old sequential amp
    # replaces fed each other) and '&&#35;60;' must NOT collapse to '<'
    # (the old table let '&#35;'→'#' splice a new ref mid-chain; the
    # sentinel frames make that impossible)
    ("double &#38;amp; enc.", "double &amp; enc."),
    ("spliced &&#35;60; ref.", "spliced &#60; ref."),
    # nested pathological: inner refs decode, the outer assembled ref
    # stays TEXT (frames unwrap only after the amp pass)
    ("deep &#&#51;&#56;; nest.", "deep &#38; nest."),
    # raw sentinel bytes in ref-bearing input strip (they could
    # otherwise forge a frame); plain control bytes elsewhere survive
    ("ctrl \x01\x02 bytes &#60; here.", "ctrl bytes < here."),
    # normalization pass (round 9, second wave): leading zeros and the
    # uppercase-X marker canonicalize before the table
    ("Zero &#060; hexzero &#x003C; marker &#X3C; both &#X0041;.",
     "Zero < hexzero < marker < both A."),
    ("Padded nbsp &#0160;B.", "Padded nbsp B."),
    # documented boundaries: out-of-table and truncated/unterminated
    # refs pass through as text (normalization requires the full
    # ';'-terminated shape)
    ("Snowman &#9731; cut &#60 loose &#X2 end.",
     "Snowman &#9731; cut &#60 loose &#X2 end."),
    # backslash code point round-trips via chr(92) (engine-safe literal)
    ("Back&#92;slash &#x5c; &#x5C;.", "Back\\slash \\ \\."),
]


@pytest.mark.parametrize("raw,want", GOLDENS)
def test_strip_goldens_spark(spark, raw, want):
    assert _spark_strip(spark, raw) == want


@pytest.mark.parametrize("raw,want", GOLDENS)
def test_strip_goldens_duckdb(raw, want):
    assert _duck_strip(raw) == want


LINES = [
    ("This line ends properly.", True),
    ("Ends with a bang!", True),
    ("Does it end with a question?", True),
    ('He said "end quote."', True),
    ("no terminal punctuation here", False),
    ("Too short.", False),                       # < 3 words
    ("Enable Javascript to continue now.", False),
    ("This site uses cookies to track you.", False),
    ("lorem ipsum dolor sit amet.", False),
    ("var f = function() { return 1; }.", False),  # curly brace
]


@pytest.mark.parametrize("line,keep", LINES)
def test_line_keep_rule_both_engines(spark, line, keep):
    pred = H.LINE_KEEP_SQL.format(line="line")
    got_s = (
        spark.createDataFrame([(line,)], "line: string")
        .select(F.expr(pred).alias("k")).first()["k"]
    )
    got_d = duckdb.sql(
        f"SELECT {pred} FROM (SELECT ? AS line)", params=[line]
    ).fetchone()[0]
    assert got_s == keep, f"spark: {line!r}"
    assert got_d == keep, f"duckdb: {line!r}"


def test_line_quality_filter_end_to_end(spark):
    doc = (
        "<p>Enable Javascript to view this page.</p>\n"
        "<p>First real sentence stays in.</p>\n"
        "<p>short.</p>\n"
        "<p>Second real sentence also stays.</p>"
    )
    df = spark.createDataFrame([(1, doc)], "doc_id: long, html: string")
    out = H.line_quality_filter(H.html_extract(df)).collect()
    assert [(r.line_no, r.line) for r in out] == [
        (1, "First real sentence stays in."),
        (3, "Second real sentence also stays."),
    ]


def test_extract_plan_is_map_only_no_udf(spark):
    """100 TB posture pin: the whole extraction is codegen projections —
    no Exchange, no Python UDF node."""
    df = spark.createDataFrame(
        [(i, f"<p>doc {i} body text.</p>") for i in range(8)],
        "doc_id: long, html: string",
    )
    plan = H.html_extract(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for udf_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert udf_node not in plan


def test_line_filter_plan_single_narrow_generate(spark):
    df = spark.createDataFrame(
        [(i, f"Alpha beta gamma {i}.\nshort") for i in range(8)],
        "doc_id: long, clean_text: string",
    )
    plan = (
        H.line_quality_filter(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Generate" in plan  # the one posexplode


def test_synth_templates_cover_all_branches(spark):
    """Every id%6 template parses back to non-empty clean text and the
    boilerplate templates actually exercise the drop rules."""
    rows = [
        (i, "alpha beta gamma delta epsilon zeta " * 4, f"src{i % 2}")
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, source: string"
    )
    out = H.html_extract(H.attach_html(df)).orderBy("doc_id").collect()
    assert len(out) == 6
    assert all(r.clean_text for r in out)
    assert out[0].n_lines >= 2          # template 0 is multi-line
    kept = H.line_quality_filter(H.html_extract(H.attach_html(df)))
    by_doc = {r.doc_id for r in kept.collect()}
    assert 3 in by_doc                   # template 3 keeps its one real line
    assert 5 in by_doc                   # passthrough keeps its line


def test_c4_clean_documents_reassembly_and_page_rule(spark):
    """Fused pipeline: kept lines reassembled in original order; docs
    below the minimum-retained-lines page rule are dropped entirely."""
    docs = [
        # doc 1: two kept lines around a dropped one -> survives
        (1, "First sentence stays in.\nno punct\nSecond sentence stays too."),
        # doc 2: only one kept line -> dropped by the page rule
        (2, "Only one good sentence here.\nshort\nnope"),
        # doc 3: nothing kept -> dropped
        (3, "tiny\nlines\nonly"),
    ]
    df = spark.createDataFrame(docs, "doc_id: long, clean_text: string")
    out = {r.doc_id: r for r in H.c4_clean_documents(df, min_kept_lines=2).collect()}
    assert set(out) == {1}
    assert out[1].total_lines == 3 and out[1].kept_lines == 2
    assert out[1].kept_text == (
        "First sentence stays in.\nSecond sentence stays too."
    )


def test_c4_clean_plan_single_shuffle(spark):
    """One Exchange only (the per-doc reassembly); the line predicate
    prunes before it."""
    df = spark.createDataFrame(
        [(i, f"Alpha beta gamma {i}.\nshort") for i in range(8)],
        "doc_id: long, clean_text: string",
    )
    out = H.c4_clean_documents(df)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") <= 1


def test_line_dedup_corpus_keep_first_and_short_exemption(spark):
    """Keep-first across documents by (doc_id, line_no); lines shorter
    than min_line_chars pass through everywhere."""
    docs = [
        (1, "This boilerplate sentence repeats.\nUnique to doc one."),
        (2, "This boilerplate sentence repeats.\nUnique to doc two."),
        # short line 'ok.' duplicated in both but exempt (< 10 chars)
        (3, "ok.\nAnother unique sentence three."),
        (4, "ok.\nThis boilerplate sentence repeats."),
    ]
    df = spark.createDataFrame(docs, "doc_id: long, clean_text: string")
    out = {r.doc_id: r for r in H.line_dedup(df, min_line_chars=10).collect()}
    assert out[1].kept_lines == 2                       # first copy survives
    assert out[2].kept_lines == 1
    assert out[2].kept_text == "Unique to doc two."     # dup line removed
    assert out[3].kept_lines == 2                       # short line exempt
    assert out[4].kept_lines == 1
    assert out[4].kept_text == "ok."                    # dup removed, short kept


def test_line_dedup_conservation(spark):
    """kept_lines sums: every distinct eligible line survives exactly
    once corpus-wide; short lines survive everywhere."""
    docs = [(i, "Common repeated line here.\nshort\nDoc specific %d line." % i)
            for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id: long, clean_text: string")
    rows = H.line_dedup(df, min_line_chars=10).collect()
    total_kept = sum(r.kept_lines for r in rows)
    # 5 doc-specific + 1 surviving common + 5 exempt short = 11
    assert total_kept == 11


def test_line_dedup_plan_agg_keeper_no_window(spark):
    """Hot-line posture: the keeper is an aggregate, never a window —
    no single task holds a boilerplate line's occurrence list."""
    df = spark.createDataFrame(
        [(i, "Alpha beta gamma delta.\nshort") for i in range(8)],
        "doc_id: long, clean_text: string",
    )
    out = H.line_dedup(df)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan
    # round 9: the keeper join key is the 16-byte md5 fingerprint, so
    # neither the keeper exchange nor the join condition carries the
    # raw line text
    import re as _re

    joins = [ln for ln in plan.split("\n") if "SortMergeJoin" in ln
             or "ShuffledHashJoin" in ln or "BroadcastHashJoin" in ln]
    assert joins and all("__lfp" in ln for ln in joins), joins
    assert not _re.search(r"Join [^\n]*\bline#", plan)


def test_extract_links_and_synth_links(spark):
    from pgferry_spark.operators.domains import domain_link_stats

    rows = [(i, "alpha beta gamma delta " * 5, f"src{i % 2}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    links = H.extract_links(H.attach_html(df)).collect()
    # only template 2 (doc_id % 6 == 2) embeds anchors: two per doc
    assert {r.doc_id for r in links} == {2}
    by_no = {r.link_no: r.href for r in links}
    assert by_no[0] == "https://ref.src0.org/also/2"
    assert by_no[1] == "HTTP://Media.src0.org:8080/p?q=2"
    stats = {
        r.domain: (r.n_links, r.n_src_docs)
        for r in domain_link_stats(
            H.extract_links(H.attach_html(df))
        ).collect()
    }
    assert stats["src0.org"] == (2, 1)


def test_extract_links_no_pushed_size_filter(spark):
    """posexplode_outer + null filter, not plain explode: explode infers
    a pushable size(arr)>0 filter that clones the regexp_extract_all
    into the scan (documented gotcha)."""
    df = spark.createDataFrame(
        [(1, 'x <a href="https://a.com/1">l</a> y'), (2, "no links here")],
        "doc_id: long, html: string",
    )
    out = H.extract_links(df)
    assert out.count() == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("regexp_extract_all") <= 2  # not cloned into a filter


class TestTitleMeta:
    def test_spellings_orders_and_absence(self, spark):
        from pyspark.sql import functions as F  # noqa: F811

        from pgferry_spark.operators.html import html_title_meta

        rows = [
            (1, '<head><TITLE> Padded Title </TITLE>'
                '<meta name="description" content="Quoted desc."></head>'),
            # content-before-name, unquoted name attr
            (2, '<meta content="Lead text." name=description>'
                '<title>lower title</title>'),
            (3, '<p>no head metadata at all</p>'),
            # first match wins on duplicates
            (4, '<title>first</title><title>second</title>'),
        ]
        df = spark.createDataFrame(rows, "doc_id: long, html: string")
        got = {r.doc_id: (r.title, r.meta_description)
               for r in html_title_meta(df).collect()}
        assert got[1] == ("Padded Title", "Quoted desc.")
        assert got[2] == ("lower title", "Lead text.")
        assert got[3] == ("", "")
        assert got[4][0] == "first"

    def test_plan_map_only(self, spark):
        from pgferry_spark.operators.html import html_title_meta

        df = spark.createDataFrame([(1, "<p>x</p>")],
                                   "doc_id: long, html: string")
        plan = (html_title_meta(df)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan


class TestExtractTables:
    def test_ordinality_attributes_case_and_absence(self, spark):
        from pgferry_spark.operators.html import extract_tables

        rows = [
            (1, '<p>x</p><table class="a"><tr><th>K</th><th>V</th></tr>'
                '<tr><td>id</td><td>7</td></tr></table>'
                '<TABLE><TR><TD>solo</TD></TR></TABLE>'),
            (2, "<p>no tables here</p>"),
        ]
        df = spark.createDataFrame(rows, "doc_id: long, html: string")
        got = [
            (r.table_no, r.row_no, r.col_no, r.cell)
            for r in extract_tables(df)
            .orderBy("doc_id", "table_no", "row_no", "col_no").collect()
        ]
        assert got == [
            (0, 0, 0, "K"), (0, 0, 1, "V"),
            (0, 1, 0, "id"), (0, 1, 1, "7"),
            (1, 0, 0, "solo"),
        ]
