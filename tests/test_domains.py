"""Domain-aware curation: messy-URL parsing goldens, quota determinism,
blocklist anti-join, and the shared-template contract (the SAME SQL
strings drive Spark via F.expr and the DuckDB oracle)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from pgferry_spark.operators.domains import (
    DOMAIN_SQL,
    HOST_SQL,
    NURL_SQL,
    QCLEAN_SQL,
    attach_urls,
    blocklist_filter,
    domain_quota_sample,
    domain_stats,
    normalize_urls,
    url_dedup,
    with_host_domain,
)

# (url, expected host, expected domain) — the messy goldens
GOLDENS = [
    ("https://www.example.com/a/b?q=1", "www.example.com", "example.com"),
    ("HTTP://News.Example.COM:8080/x", "news.example.com", "example.com"),
    ("https://user:pw@cdn.example.net/y#f", "cdn.example.net", "example.net"),
    ("example.org/path", "example.org", "example.org"),  # scheme-less
    ("ftp://Files.Example.COM./pub", "files.example.com", "example.com"),
    ("https://192.168.7.10/raw", "192.168.7.10", "192.168.7.10"),  # IP whole
    ("https://a.b.c.example.com/z", "a.b.c.example.com", "example.com"),
    # documented approximation: last-two-labels maps *.co.uk -> co.uk
    ("https://shop.example.co.uk/?r=2", "shop.example.co.uk", "co.uk"),
    ("localhost:9090/metrics", "localhost", "localhost"),  # single label
    ("not a url", "not", "not"),  # regex grabs the first token; no crash
    ("", "", ""),
]


class TestHostDomainGoldens:
    def test_spark_goldens(self, spark):
        df = spark.createDataFrame(
            [(i, u) for i, (u, _, _) in enumerate(GOLDENS)], "id: long, url: string"
        )
        rows = {r["id"]: (r["host"], r["domain"])
                for r in with_host_domain(df).collect()}
        for i, (u, want_host, want_dom) in enumerate(GOLDENS):
            assert rows[i] == (want_host, want_dom), u

    def test_duckdb_same_templates_same_answers(self):
        """The oracle's regexes ARE the Spark regexes: run the goldens
        through DuckDB with the identical template strings."""
        host = HOST_SQL.format(url="url")
        dom = DOMAIN_SQL.format(host="host")
        for u, want_host, want_dom in GOLDENS:
            got = duckdb.sql(
                f"SELECT host, {dom} AS domain FROM "
                f"(SELECT {host} AS host FROM (SELECT ? AS url))",
                params=[u],
            ).fetchone()
            assert got == (want_host, want_dom), u

    def test_null_url_yields_null(self, spark):
        df = spark.createDataFrame([(1, None)], "id: long, url: string")
        r = with_host_domain(df).collect()[0]
        assert r["host"] is None and r["domain"] is None


@pytest.fixture()
def docs(spark):
    rows = [
        (i, f"text body {i % 4}", f"src{i % 3}", 10 + i)
        for i in range(40)
    ]
    return attach_urls(
        spark.createDataFrame(rows, "doc_id: long, text: string, source: string, n_chars: long")
    )


class TestDomainOps:
    def test_domain_stats_shape_and_dup_rate(self, docs):
        out = {r["domain"]: r for r in domain_stats(docs).collect()}
        # template 0 and 7 share src{k}-news.com across two hosts
        news = [d for d in out if d.endswith("-news.com")]
        assert news and all(out[d]["n_hosts"] == 2 for d in news)
        for r in out.values():
            assert 0.0 <= r["dup_rate"] < 1.0
            assert r["total_chars"] > 0

    def test_quota_sample_deterministic_and_capped(self, docs):
        a = {(r["doc_id"], r["domain"])
             for r in domain_quota_sample(docs, n_per_domain=2).collect()}
        b = {(r["doc_id"], r["domain"])
             for r in domain_quota_sample(docs, n_per_domain=2).collect()}
        assert a == b  # md5-ordered pick: no RNG, no partition sensitivity
        from collections import Counter
        per_dom = Counter(d for _, d in a)
        assert all(v <= 2 for v in per_dom.values())

    def test_blocklist_filter_drops_only_blocked(self, spark, docs):
        all_dom = {r["domain"] for r in with_host_domain(docs).collect()}
        blocked_pick = sorted(all_dom)[:2]
        blocked = spark.createDataFrame(
            [(d,) for d in blocked_pick], "domain: string"
        )
        kept = blocklist_filter(docs, blocked)
        kept_doms = {r["domain"] for r in kept.collect()}
        assert kept_doms == all_dom - set(blocked_pick)
        # row accounting: nothing besides blocked rows was dropped
        n_blocked = (
            with_host_domain(docs)
            .filter(F.col("domain").isin(blocked_pick))
            .count()
        )
        assert kept.count() == docs.count() - n_blocked

    def test_url_dedup_collapses_variants(self, spark):
        """Redirect/tracking variants of one page must share a canonical
        key; distinct pages must not."""
        variants = [
            (0, "https://www.Example.com/a/?utm_source=x&q=1#frag"),
            (1, "http://example.com/a?q=1"),
            (2, "https://user@example.com:443/a/?q=1&fbclid=zz"),
            (3, "https://example.com/b"),                    # different page
            (4, "https://example.com/a?q=2"),                # different query
        ]
        df = spark.createDataFrame(variants, "doc_id: long, url: string")
        out = {r["nurl"]: (r["keeper_id"], r["dup_count"])
               for r in url_dedup(df).collect()}
        assert out["example.com/a?q=1"] == (0, 3)
        assert out["example.com/b"] == (3, 1)
        assert out["example.com/a?q=2"] == (4, 1)

    def test_nurl_goldens_both_engines(self):
        cases = [
            ("https://www.Example.com/a/?utm_source=x&q=1&fbclid=z#f",
             "example.com/a?q=1"),
            ("https://example.com/p?utm_a=1", "example.com/p"),
            ("http://user@example.com:80/a//", "example.com/a"),
            ("example.com/?ref=7&keep=1", "example.com?keep=1"),
            ("https://example.com", "example.com"),
        ]
        host = HOST_SQL.format(url="url")
        qc = QCLEAN_SQL.format(url="url", g=", 'g'")
        nurl = NURL_SQL.format(url="url", host="host")
        for u, want in cases:
            got = duckdb.sql(
                f"SELECT {nurl} FROM (SELECT *, {qc} AS __q FROM "
                f"(SELECT *, {host} AS host FROM (SELECT ? AS url)))",
                params=[u],
            ).fetchone()[0]
            assert got == want, u

    def test_nurl_spark_matches_duckdb_on_corpus(self, spark, docs):
        sp = {r["doc_id"]: r["nurl"] for r in normalize_urls(docs).collect()}
        host = HOST_SQL.format(url="url")
        qc = QCLEAN_SQL.format(url="url", g=", 'g'")
        nurl = NURL_SQL.format(url="url", host="host")
        pdf = docs.select("doc_id", "url").toPandas()
        dk = dict(
            duckdb.sql(
                f"SELECT doc_id, {nurl} FROM (SELECT *, {qc} AS __q FROM "
                f"(SELECT *, {host} AS host FROM pdf))"
            ).fetchall()
        )
        assert sp == dk

    def test_blocklist_no_forced_broadcast(self, spark, docs):
        """Same posture rule as orphans J1: strategy belongs to AQE."""
        blocked = spark.createDataFrame([("x.com",)], "domain: string")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = blocklist_filter(docs, blocked)
            out.count()
            plan = out._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastExchange" not in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


class TestCrawlSnapshotMerge:
    """Keep-newest two-snapshot merge (VERDICT r7 Next #4): status
    semantics, tie-breaks, and the zero-corpus-exchange plan pin."""

    def _frames(self, spark):
        from pgferry_spark.operators.domains import snapshot_reduce

        # previous snapshot: pages A (old content), B, C
        corpus = attach_urls(
            spark.createDataFrame(
                [(1, "contentA v1", "s", 10), (2, "contentB", "s", 10),
                 (3, "contentC", "s", 10)],
                "doc_id: long, text: string, source: string, n_chars: long",
            )
        ).select(
            "doc_id", "url",
            F.md5(F.lower(F.col("text"))).alias("fp"),
            F.lit(100).cast("long").alias("capture_ts"),
        )
        # re-crawl: A changed, B unchanged, D new; C not re-crawled.
        # doc_ids 1/2 recur (same synthesized url -> same nurl), plus a
        # duplicate capture of A (doc 9 would get a different url, so the
        # within-batch tie-break is exercised by two ts values on doc 1).
        batch = attach_urls(
            spark.createDataFrame(
                [(1, "contentA v2", "s", 10, 200),
                 (1, "contentA stale", "s", 10, 150),  # older capture, loses
                 (2, "contentB", "s", 10, 200),
                 (4, "contentD", "s", 10, 200)],
                "doc_id: long, text: string, source: string, n_chars: long,"
                " capture_ts: long",
            )
        ).select(
            "doc_id", "url",
            F.md5(F.lower(F.col("text"))).alias("fp"),
            "capture_ts",
        )
        return snapshot_reduce(corpus), batch

    def test_status_semantics_and_keep_newest(self, spark):
        from pgferry_spark.operators.domains import (
            crawl_delta_counts,
            crawl_snapshot_merge,
        )

        corpus_index, batch = self._frames(spark)
        nurl_of = {
            r["doc_id"]: r["nurl"]
            for r in normalize_urls(
                attach_urls(
                    spark.createDataFrame(
                        [(i, "s") for i in (1, 2, 3, 4)],
                        "doc_id: long, source: string",
                    )
                )
            ).collect()
        }
        out = {
            r["nurl"]: r
            for r in crawl_snapshot_merge(corpus_index, batch).collect()
        }
        a, b, c, d = (out[nurl_of[i]] for i in (1, 2, 3, 4))
        assert a["status"] == "changed" and a["capture_ts"] == 200
        assert a["fp"] == out[nurl_of[1]]["fp"]  # newest capture's fp won
        assert b["status"] == "unchanged" and b["capture_ts"] == 200
        assert c["status"] == "carried" and c["capture_ts"] == 100
        assert d["status"] == "new" and d["capture_ts"] == 200
        counts = {
            r["status"]: r["n_urls"]
            for r in crawl_delta_counts(
                crawl_snapshot_merge(corpus_index, batch)
            ).collect()
        }
        assert counts == {"changed": 1, "unchanged": 1, "carried": 1, "new": 1}

    def test_stale_capture_is_not_labeled_changed(self, spark):
        """Round-9 ADVICE: when the batch's only capture of a URL is
        OLDER than the index row (out-of-order replay), keep-newest keeps
        the index row — the status must say 'stale_capture', not
        'changed' (which would overstate churn for an unchanged index),
        and the winning (corpus) ts/fp must survive."""
        from pgferry_spark.operators.domains import (
            crawl_delta_counts,
            crawl_snapshot_merge,
            snapshot_reduce,
        )

        corpus = attach_urls(
            spark.createDataFrame(
                [(1, "contentA v2", "s", 10)],
                "doc_id: long, text: string, source: string, n_chars: long",
            )
        ).select(
            "doc_id", "url",
            F.md5(F.lower(F.col("text"))).alias("fp"),
            F.lit(300).cast("long").alias("capture_ts"),
        )
        batch = attach_urls(
            spark.createDataFrame(
                [(1, "contentA v1", "s", 10, 100)],  # older AND different
                "doc_id: long, text: string, source: string, n_chars: long,"
                " capture_ts: long",
            )
        ).select(
            "doc_id", "url",
            F.md5(F.lower(F.col("text"))).alias("fp"),
            "capture_ts",
        )
        merged = crawl_snapshot_merge(snapshot_reduce(corpus), batch)
        row = merged.collect()[0]
        assert row["status"] == "stale_capture"
        assert row["capture_ts"] == 300  # index row untouched
        counts = {
            r["status"]: r["n_urls"]
            for r in crawl_delta_counts(merged).collect()
        }
        assert counts == {"stale_capture": 1}

    def test_merge_corpus_side_reads_bucketed_no_exchange(self, spark):
        """The 100 TB posture: the previous snapshot's URL index is a
        table bucketed on nurl, so the full-outer merge reads it with NO
        corpus-side Exchange — only the (small) new crawl shuffles
        (once: its within-batch reduce; the join reuses that
        partitioning). Mirrors incremental_dedup's fingerprint-index
        plan pin in test_layout_skew."""
        from pgferry_spark.operators.domains import crawl_snapshot_merge
        from pgferry_spark.sources.layout import write_bucketed

        corpus_index, batch = self._frames(spark)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            # bucket count == spark.sql.shuffle.partitions (4 in tests):
            # the one-side-bucketed join only skips the bucket-side
            # exchange when the probe side shuffles into EXACTLY the
            # bucket count
            n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
            write_bucketed(
                corpus_index, "b_nurl_index", "nurl",
                num_buckets=n_shuffle, sort_by="nurl",
            )
            merged = crawl_snapshot_merge(spark.table("b_nurl_index"), batch)
            assert merged.count() == 4
            plan = merged._jdf.queryExecution().executedPlan().toString()
            final = plan.split("== Initial Plan ==")[0]
            assert final.count("Exchange hashpartitioning") == 1, final
            assert "Bucketed: true" in final
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
            spark.sql("DROP TABLE IF EXISTS b_nurl_index")


class TestUrlKeywordFilter:
    def test_path_keyed_not_host_keyed(self, spark):
        from pgferry_spark.operators.domains import url_keyword_filter

        rows = [
            (1, "https://raw-news.com/articles/1"),   # 'raw' in HOST only
            (2, "https://example.com/raw/data"),      # 'raw' in path
            (3, "https://example.com/p?next=login"),  # keyword in query
            (4, "https://example.com/clean/page"),
        ]
        df = spark.createDataFrame(rows, "doc_id: long, url: string")
        kept = sorted(
            r.doc_id
            for r in url_keyword_filter(df, ("raw", "login")).collect()
        )
        assert kept == [1, 4]


class TestDomainTokenBudget:
    def test_prefix_under_budget_per_domain(self, spark):
        from pgferry_spark.operators.domains import domain_token_budget

        # one domain, known md5(id) admission order; budget cuts a suffix
        rows = [(i, f"https://ex.com/{i}", 100) for i in range(1, 6)]
        df = spark.createDataFrame(rows, "doc_id: long, url: string, n_toks: int")
        out = domain_token_budget(df, budget=250).collect()
        # 100-token docs, 250 budget -> exactly the first 2 in md5 order
        assert len(out) == 2
        assert all(r.cum_toks <= 250 for r in out)
        import hashlib
        order = sorted(
            range(1, 6), key=lambda i: hashlib.md5(str(i).encode()).hexdigest()
        )
        assert sorted(r.doc_id for r in out) == sorted(order[:2])

    def test_budget_is_per_domain_not_global(self, spark):
        from pgferry_spark.operators.domains import domain_token_budget

        rows = [(1, "https://a.com/x", 200), (2, "https://b.com/y", 200)]
        df = spark.createDataFrame(rows, "doc_id: long, url: string, n_toks: int")
        out = domain_token_budget(df, budget=250).collect()
        assert len(out) == 2  # each domain has its own budget

    def test_skew_safe_equals_single_window_on_mega_domain(self, spark):
        """Round-9 skew posture (VERDICT r8 Next #4): on a deliberately
        skewed corpus — ONE domain holding 50% of all rows — the
        bucketed two-pass path returns exactly the single-window
        answer, and its per-doc windows partition on (domain, md5
        bucket), never on the bare domain."""
        from pgferry_spark.operators.domains import domain_token_budget

        rows = [
            (i, "https://mega.com/p%d" % i if i % 2 == 0
             else "https://site%d.org/x" % (i % 37), 7 + i % 13)
            for i in range(1, 801)
        ]
        df = spark.createDataFrame(
            rows, "doc_id: long, url: string, n_toks: int"
        )
        fast = domain_token_budget(df, budget=300, skew_safe=True)
        slow = domain_token_budget(df, budget=300, skew_safe=False)
        key = lambda r: (r.domain, r.doc_id, r.n_toks, r.cum_toks)  # noqa: E731
        got, want = sorted(map(key, fast.collect())), sorted(
            map(key, slow.collect())
        )
        assert got == want and len(got) > 30
        plan = fast._jdf.queryExecution().executedPlan().toString()
        # every Window partitions on (domain, __b) or the bounded
        # ≤256-row bucket rollup on domain; no per-doc window keyed on
        # the bare domain
        import re as _re

        win_specs = _re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        assert win_specs, plan
        per_doc = [s for s in win_specs if "__h" in s]
        assert per_doc and all("__b" in s for s in per_doc), win_specs

    def test_skew_safe_carry_prunes_before_per_doc_window(self, spark):
        """The mega-domain tail (buckets whose carry-in exceeds the
        budget) is dropped by the bucket rollup join, so admitted rows
        stay a stable prefix: n_toks=0 docs at cum==budget included."""
        from pgferry_spark.operators.domains import domain_token_budget

        rows = [(i, "https://one.com/a", 100) for i in range(1, 101)]
        df = spark.createDataFrame(
            rows, "doc_id: long, url: string, n_toks: int"
        )
        out = domain_token_budget(df, budget=300, skew_safe=True).collect()
        assert len(out) == 3 and max(r.cum_toks for r in out) == 300


class TestCrawlMergeAlgebra:
    def test_random_batches_fold_to_reference_keep_newest(self, spark):
        """Bulk randomized check: folding 3 random capture batches
        through crawl_snapshot_merge equals a reference Python fold with
        the documented rules (within-batch: max ts then min id;
        cross-batch: the batch wins ties). URL variants (utm params,
        fragments) collapse to one canonical key throughout."""
        import random

        from pgferry_spark.operators.domains import (
            crawl_snapshot_merge,
            snapshot_reduce,
        )

        rng = random.Random(8)
        caps = []
        for did in range(1, 61):
            i = rng.randrange(12)
            suffix = rng.choice(["", "?utm_source=x", "#frag"])
            caps.append(
                (did, f"https://site{i % 4}.com/p/{i}{suffix}",
                 rng.randrange(1, 50), f"fp{did}")
            )
        batches = [caps[0:20], caps[20:40], caps[40:60]]
        schema = "doc_id: long, url: string, capture_ts: long, fp: string"

        # reference fold in plain Python
        def nurl_of(url):
            u = url.split("#")[0].split("?")[0]
            return u.replace("https://", "")

        index = {}
        for batch in batches:
            reduced = {}
            for did, url, ts, fp in batch:
                k = nurl_of(url)
                cur = reduced.get(k)
                if cur is None or (ts, -did) > (cur[2], -cur[0]):
                    reduced[k] = (did, url, ts, fp)
            for k, (did, url, ts, fp) in reduced.items():
                cur = index.get(k)
                if cur is None or ts >= cur[1]:
                    index[k] = (did, ts, fp)

        # Spark fold
        spark_index = snapshot_reduce(
            spark.createDataFrame(batches[0], schema)
        )
        for batch in batches[1:]:
            spark_index = crawl_snapshot_merge(
                spark_index, spark.createDataFrame(batch, schema)
            ).drop("status")
        got = {
            r.nurl: (r.doc_id, r.capture_ts, r.fp)
            for r in spark_index.collect()
        }
        assert got == index


class TestWebCurationFunnel:
    def test_stage_counts_hand_computed(self, spark):
        from pgferry_spark.operators.domains import web_curation_funnel

        rows = [
            # survives everything; shares its nurl with doc 2 (variant)
            (1, "https://good.com/a", "<p>First real sentence here.</p>\n"
                "<p>Second real sentence too.</p>"),
            (2, "https://www.good.com/a?utm_source=x",
                "<p>First real sentence here.</p>\n"
                "<p>Second real sentence too.</p>"),
            # blocked keyword in path
            (3, "https://good.com/login/page", "<p>Fine sentence one here.</p>\n"
                "<p>Fine sentence two here.</p>"),
            # blocked domain
            (4, "https://bad.com/b", "<p>Fine sentence one here.</p>\n"
                "<p>Fine sentence two here.</p>"),
            # passes gates, fails the page rule (one kept line)
            (5, "https://good.com/c", "<p>Only one good sentence.</p>\n"
                "<p>short</p>"),
        ]
        df = spark.createDataFrame(rows, "doc_id: long, url: string, html: string")
        got = {
            r.stage: r.n_docs
            for r in web_curation_funnel(df, ("bad.com",), ("login",)).collect()
        }
        assert got == {
            "0_raw": 5,
            "1_url_keyword_gate": 4,      # doc 3 dropped
            "2_domain_blocklist": 3,      # doc 4 dropped
            "3_robots_noindex": 3,        # no meta-robots in this fixture
            "4_page_clean": 2,            # doc 5 fails the page rule
            "5_url_dedup_keepers": 1,     # docs 1+2 share one nurl
        }


def test_url_path_template_identical_both_engines(spark):
    """URL_PATH_SQL + url_keyword_sql evaluate identically in Spark and
    DuckDB on the messy-URL goldens (direct template pin; the funnel
    oracle exercises it end-to-end)."""
    from pgferry_spark.operators.domains import URL_PATH_SQL, url_keyword_sql

    urls = [
        "https://raw-news.com/articles/1",
        "https://example.com/raw/data?x=1#f",
        "HTTP://User:pw@Site.org:8080/Login/Page",
        "example.org/post/9",
        "https://bare.com",
        "",
    ]
    path = URL_PATH_SQL.format(url="u")
    score = url_keyword_sql(f"({path})", ("raw", "login", "post"))
    for u in urls:
        sp = (
            spark.createDataFrame([(u,)], "u: string")
            .select(F.expr(path).alias("p"), F.expr(score).alias("s"))
            .first()
        )
        dk = duckdb.sql(
            f"SELECT {path} AS p, {score} AS s FROM (SELECT ? AS u)",
            params=[u],
        ).fetchone()
        assert (sp["p"], sp["s"]) == dk, u


def test_surt_template_identical_both_engines(spark):
    """SURT_SQL (round 10, the CDX key) evaluates identically in Spark
    and DuckDB across the per-engine function-name params, and the key
    has the clustering property sorting exists for: every capture under
    a domain — subdomains included — shares the reversed-label prefix."""
    from pgferry_spark.operators.domains import (
        HOST_SQL,
        SURT_DUCK,
        SURT_SPARK,
        SURT_SQL,
        URL_PATH_SQL,
    )

    urls = [
        "https://www.example.org/articles/1?x=2",
        "https://a.b.example.org/articles/1",
        "HTTP://Media.example.org:8080/p?q=7",
        "example.org/post/9",
        "https://192.168.3.10/raw",
    ]
    from pgferry_spark.operators.domains import SURT_PORT_SQL

    host = HOST_SQL.format(url="u")
    path = URL_PATH_SQL.format(url="u")
    port = SURT_PORT_SQL.format(url="u")
    sp_expr = SURT_SQL.format(
        host=f"({host})", path=path, port=port, **SURT_SPARK
    )
    dk_expr = SURT_SQL.format(
        host=f"({host})", path=path, port=port, **SURT_DUCK
    )
    got = []
    for u in urls:
        sp = (
            spark.createDataFrame([(u,)], "u: string")
            .select(F.expr(sp_expr).alias("s"))
            .first()["s"]
        )
        dk = duckdb.sql(
            f"SELECT {dk_expr} AS s FROM (SELECT ? AS u)", params=[u]
        ).fetchone()[0]
        assert sp == dk, u
        got.append(sp)
    # round 13: official massage rules — www label stripped, the
    # non-default port kept after the reversed host (the public
    # cc-index urlkey spellings)
    assert got[0] == "org,example)/articles/1?x=2"
    assert got[1] == "org,example,b,a)/articles/1"
    assert got[2] == "org,example,media:8080)/p?q=7"
    assert got[3] == "org,example)/post/9"
    # the clustering property: all example.org captures share the prefix
    assert all(s.startswith("org,example") for s in got[:4])
    assert got[4] == "10,3,168,192)/raw"


def test_surt_keys_operator_map_only(spark):
    from pgferry_spark.operators.domains import surt_keys

    df = spark.createDataFrame(
        [(1, "https://www.ex.org/a"), (2, "https://cdn.ex.org/b?z=1")],
        "doc_id: long, url: string",
    )
    out = surt_keys(df)
    got = {r.doc_id: r.surt for r in out.collect()}
    assert got == {1: "org,ex)/a", 2: "org,ex,cdn)/b?z=1"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only


class TestRecrawlChangeRate:
    """Cho & Garcia-Molina change-frequency estimation: a never-changed
    page reads rate 0, an always-changing page reads a finite positive
    rate above the naive X/T (the bias correction), a single capture is
    unobservable (nulls + default due), and same-instant captures break
    ties deterministically."""

    def _run(self, spark, rows):
        from pgferry_spark.operators.domains import recrawl_change_rate

        df = spark.createDataFrame(
            rows, "nurl: string, ts_s: long, digest: string"
        )
        return {r.nurl: r for r in recrawl_change_rate(df).collect()}

    def test_estimator_shapes(self, spark):
        import math

        day = 86400
        rows = (
            # static: 5 captures over 4 days, digest never moves
            [("static", 1000 + i * day, "d0") for i in range(5)]
            # volatile: digest moves every capture (X = n = 4)
            + [("volatile", 1000 + i * day, f"d{i}") for i in range(5)]
            # half: changes on 2 of 4 intervals
            + [("half", 1000 + i * day, d)
               for i, d in enumerate(["a", "a", "b", "b", "c"])]
            # lonely: one capture
            + [("lonely", 1000, "x")]
        )
        got = self._run(spark, rows)
        assert got["static"].n_changes == 0
        assert got["static"].change_rate_per_day == 0.0
        assert got["static"].est_interval_s == 4 * day
        v = got["volatile"]
        assert v.n_changes == 4
        # CGM with X == n: -ln(0.5/4.5) * n / T — finite, and above
        # the naive X/T because observed changes undercount
        want = round(-math.log(0.5 / 4.5) * 4 / (4 * day) * day, 6)
        assert v.change_rate_per_day == want
        assert v.change_rate_per_day > 1.0  # naive X/T reads exactly 1/day
        assert v.est_interval_s == day
        h = got["half"]
        assert h.n_changes == 2 and h.est_interval_s == 2 * day
        lone = got["lonely"]
        assert lone.change_rate_per_day is None
        assert lone.est_interval_s is None
        assert lone.next_due_s == 1000 + 7 * 86400  # default fallback

    def test_same_instant_tiebreak_deterministic(self, spark):
        rows = [
            ("u", 1000, "b"), ("u", 1000, "a"), ("u", 2000, "b"),
        ]
        got = self._run(spark, rows)["u"]
        # order is (ts, digest): a,b @1000 then b @2000 -> changes:
        # a->b (yes), b->b (no) = 1, regardless of input row order
        assert got.n_changes == 2 - 1
        got2 = self._run(spark, list(reversed(rows)))["u"]
        assert got2.n_changes == got.n_changes


class TestSitemapLastmodEntries:
    def test_block_scoped_pairing(self, spark):
        """Each <loc> pairs with ITS block's lastmod; a flat regex
        would cross-pair — the mixed/missing fixture catches that."""
        from pgferry_spark.operators.domains import parse_sitemap_entries

        xml = (
            '<?xml version="1.0"?><urlset>\n'
            "<url><loc>https://d.org/a</loc>"
            "<lastmod>2024-01-05</lastmod></url>\n"
            "<url><loc>https://d.org/b</loc></url>\n"
            "<url><lastmod>2024-08-10T12:30:00Z</lastmod>"
            "<loc>https://d.org/c</loc></url>\n"
            "</urlset>"
        )
        df = spark.createDataFrame(
            [("d.org", xml)], "domain: string, sitemap_xml: string"
        )
        got = {
            r.loc_url: r.lastmod
            for r in parse_sitemap_entries(df).collect()
        }
        assert got == {
            "https://d.org/a": "2024-01-05",
            "https://d.org/b": "",
            "https://d.org/c": "2024-08-10T12:30:00Z",
        }

    def test_pretty_printed_multiline_blocks(self, spark):
        """Real-world sitemaps are pretty-printed: newlines INSIDE
        each <url> block.  Without (?s) the block regex's '.' stops
        at the newline and the whole document silently parses to
        zero entries (r13 ADVICE)."""
        from pgferry_spark.operators.domains import parse_sitemap_entries

        xml = (
            '<?xml version="1.0"?>\n<urlset>\n'
            "  <url>\n"
            "    <loc>https://p.org/a</loc>\n"
            "    <lastmod>2024-01-05</lastmod>\n"
            "  </url>\n"
            "  <url>\n"
            "    <loc>https://p.org/b</loc>\n"
            "  </url>\n"
            "</urlset>\n"
        )
        df = spark.createDataFrame(
            [("p.org", xml)], "domain: string, sitemap_xml: string"
        )
        got = {
            r.loc_url: r.lastmod
            for r in parse_sitemap_entries(df).collect()
        }
        assert got == {
            "https://p.org/a": "2024-01-05",
            "https://p.org/b": "",
        }

    def test_empty_and_locless_blocks(self, spark):
        from pgferry_spark.operators.domains import parse_sitemap_entries

        df = spark.createDataFrame(
            [("e.org", "<urlset></urlset>"),
             ("f.org", "<urlset><url><lastmod>2024-01-01</lastmod>"
                       "</url></urlset>")],
            "domain: string, sitemap_xml: string",
        )
        rows = parse_sitemap_entries(df).collect()
        # e.org: no blocks -> no rows; f.org: block without loc keeps
        # the row with loc_url '' (audit, not silent drop)
        assert [(r.domain, r.loc_url, r.lastmod) for r in rows] == [
            ("f.org", "", "2024-01-01"),
        ]


class TestSitemapChangedSince:
    def test_decision_table(self, spark):
        """Every arm: new URL -> fetch; no lastmod -> fetch; malformed
        lastmod -> fetch (fail open); lastmod after capture -> fetch;
        lastmod at-or-before capture -> skip."""
        from pgferry_spark.operators.domains import sitemap_changed_since

        entries = spark.createDataFrame(
            [
                ("d", 0, "https://d/new", "2024-08-01"),
                ("d", 1, "https://d/nolm", ""),
                ("d", 2, "https://d/bad", "sometime-soon"),
                ("d", 3, "https://d/hot", "2024-08-14T00:00:01Z"),
                ("d", 4, "https://d/cold", "2024-08-13"),
                ("d", 5, "https://d/edge", "2024-08-14T00:00:00Z"),
            ],
            "domain: string, loc_no: int, loc_url: string,"
            " lastmod: string",
        )
        cap_ts = 1723593600  # 2024-08-14T00:00:00Z
        caps = spark.createDataFrame(
            [(u, cap_ts) for u in
             ["https://d/nolm", "https://d/bad", "https://d/hot",
              "https://d/cold", "https://d/edge"]],
            "loc_url: string, last_capture_s: long",
        )
        got = {
            r.loc_url: (r.fetch, r.lastmod_s)
            for r in sitemap_changed_since(entries, caps).collect()
        }
        assert got["https://d/new"][0] is True       # uncaptured
        assert got["https://d/nolm"] == (True, None)  # no declaration
        assert got["https://d/bad"] == (True, None)   # malformed: open
        assert got["https://d/hot"] == (True, cap_ts + 1)
        assert got["https://d/cold"][0] is False      # provably stale
        assert got["https://d/edge"][0] is False      # ties skip


class TestCrawlBudgetAllocate:
    def test_exact_sum_and_proportionality(self, spark):
        """Allocations sum to the budget EXACTLY (largest remainder),
        follow demand ordering, and unobservable URLs count at the
        default cadence."""
        from pgferry_spark.operators.domains import crawl_budget_allocate

        rates = spark.createDataFrame(
            [("big", 10.0)] * 3 + [("mid", 5.0)] * 2
            + [("tiny", 0.001)] + [("unseen", None)] * 2,
            "site: string, change_rate_per_day: double",
        )
        out = {
            r.site: r for r in
            crawl_budget_allocate(rates, 997).collect()
        }
        total = sum(r.alloc_budget for r in out.values())
        assert total == 997  # exact, despite flooring
        assert out["big"].alloc_budget > out["mid"].alloc_budget
        assert out["mid"].alloc_budget > out["unseen"].alloc_budget
        assert out["unseen"].alloc_budget >= out["tiny"].alloc_budget
        assert out["unseen"].demand_micro == 2 * 142857
        assert out["big"].n_urls == 3

    def test_all_zero_demand_equal_split(self, spark):
        """Every rate explicitly 0.0 → total demand quantizes to zero
        micro-units; the guard (r13 ADVICE) must fall back to an
        equal largest-remainder split — exact sum, deterministic
        lexicographic remainder seats, true zero demand_micro — not a
        divide-by-zero null."""
        from pgferry_spark.operators.domains import crawl_budget_allocate

        rates = spark.createDataFrame(
            [("alpha", 0.0), ("beta", 0.0), ("gamma", 0.0)],
            "site: string, change_rate_per_day: double",
        )
        out = {
            r.site: r for r in crawl_budget_allocate(rates, 10).collect()
        }
        allocs = {s: r.alloc_budget for s, r in out.items()}
        assert sum(allocs.values()) == 10
        # 10 = 3*3 + 1 remainder seat -> lexicographically first site
        assert allocs == {"alpha": 4, "beta": 3, "gamma": 3}
        assert all(r.demand_micro == 0 for r in out.values())

    def test_deterministic_under_input_order(self, spark):
        from pgferry_spark.operators.domains import crawl_budget_allocate

        rows = [(f"s{i}", float(i % 5) + 0.1) for i in range(30)]
        a = {
            r.site: r.alloc_budget
            for r in crawl_budget_allocate(
                spark.createDataFrame(
                    rows, "site: string, change_rate_per_day: double"
                ), 1000
            ).collect()
        }
        b = {
            r.site: r.alloc_budget
            for r in crawl_budget_allocate(
                spark.createDataFrame(
                    list(reversed(rows)),
                    "site: string, change_rate_per_day: double",
                ).repartition(7), 1000
            ).collect()
        }
        assert a == b
        assert sum(a.values()) == 1000


class TestHostPagerank:
    """Quantized integer PageRank (round 14): pure-Python replay pins the
    exact micro-unit arithmetic, plus the edge-hygiene and dangling-mass
    contracts."""

    EDGES = [
        # a tiny web: b and c both cite a; a cites b; d is dangling
        # (cited, never cites); dup + self-loop must be dropped
        ("b", "a"), ("c", "a"), ("a", "b"), ("c", "d"),
        ("c", "a"),          # duplicate edge
        ("a", "a"),          # self-loop
        ("", "a"), ("a", None),  # degenerate endpoints
    ]

    @staticmethod
    def _replay(edges, iters=3, total=1_000_000_000, d=85):
        e = sorted({(s, t) for s, t in edges
                    if s and t and s != t})
        nodes = sorted({s for s, _ in e} | {t for _, t in e})
        n = len(nodes)
        out = {}
        for s, _ in e:
            out[s] = out.get(s, 0) + 1
        r = {v: total // n for v in nodes}
        for _ in range(iters):
            inflow = {v: 0 for v in nodes}
            for s, t in e:
                inflow[t] += r[s] // out[s]
            dang = sum(r[v] for v in nodes if v not in out)
            r = {
                v: ((100 - d) * (total // n)) // 100
                + (d * (inflow[v] + dang // n)) // 100
                for v in nodes
            }
        return {v: (out.get(v, 0), r[v]) for v in nodes}

    def test_matches_pure_python_replay_exactly(self, spark):
        from pgferry_spark.operators.domains import host_pagerank

        df = spark.createDataFrame(
            [(s, t) for s, t in self.EDGES], "src string, dst string"
        )
        got = {
            r["domain"]: (r["out_links"], r["pr_micro"])
            for r in host_pagerank(df).collect()
        }
        assert got == self._replay(self.EDGES)

    def test_dangling_and_authority_ordering(self, spark):
        from pgferry_spark.operators.domains import host_pagerank

        df = spark.createDataFrame(
            [(s, t) for s, t in self.EDGES], "src string, dst string"
        )
        rows = {r["domain"]: r for r in host_pagerank(df).collect()}
        # a is cited by two domains -> highest rank; d (cited once by a
        # split vote) lowest of the cited; all four nodes present
        assert set(rows) == {"a", "b", "c", "d"}
        assert rows["a"]["pr_micro"] == max(v["pr_micro"] for v in rows.values())
        # dangling d kept its inbound rank and zero out-links
        assert rows["d"]["out_links"] == 0
        # uncited c holds exactly the teleport + dangling share floor
        assert rows["c"]["pr_micro"] == min(v["pr_micro"] for v in rows.values())

    def test_mass_is_conserved_up_to_truncation(self, spark):
        from pgferry_spark.operators.domains import host_pagerank

        df = spark.createDataFrame(
            [(s, t) for s, t in self.EDGES], "src string, dst string"
        )
        total = sum(r["pr_micro"] for r in host_pagerank(df).collect())
        # every div truncates downward, never up: bounded below total,
        # and the loss after 3 iterations is tiny relative to 1e9
        assert 0 < total <= 1_000_000_000
        assert total > 990_000_000

    def test_empty_graph_returns_empty(self, spark):
        from pgferry_spark.operators.domains import host_pagerank

        df = spark.createDataFrame(
            [("x", "x"), ("", "y")], "src string, dst string"
        )
        assert host_pagerank(df).count() == 0
