"""HTTP message envelopes inside WARC response records (round 11).

Covers: the byte-level encode/parse roundtrip (status line, header
fold, header/body split, Content-Type parameter parsing), the ISO
28500 §5.9 payload-digest-over-HTTP-body subtlety, totality on
truncation (property tests: no prefix of a valid message and no
random byte soup may crash, hang, or overallocate the parser), the
declared-charset transcode, and the scale pin that container bytes
never shuffle.
"""

import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pgferry_spark.sources import httpmsg as H
from pgferry_spark.sources import warc as W


def _docs_df(spark, n=17, start=1):
    rows = [
        (i, f"https://s{i % 3}.org/d/{i}", f"Doc body {i} words here.")
        for i in range(start, start + n)
    ]
    return spark.createDataFrame(
        rows, "doc_id: long, url: string, text: string"
    )


class TestHttpMessageBytes:
    def test_roundtrip_basic(self):
        body = "héllo wörld".encode("utf-8")
        env = H.encode_http_response(
            200,
            "OK",
            [("Content-Type", "text/html; charset=utf-8"),
             ("Content-Length", str(len(body)))],
            body,
        )
        p = H.parse_http_response(env)
        assert p["status"] == 200 and p["reason"] == "OK"
        assert p["content_type"] == "text/html"
        assert p["charset"] == "utf-8"
        assert not p["truncated"]
        got = env[p["body_offset"]: p["body_offset"] + p["body_len"]]
        assert got == body

    def test_reasonless_status_line_and_no_headers(self):
        env = b"HTTP/1.1 204\r\n\r\n"
        p = H.parse_http_response(env)
        assert p["status"] == 204 and p["reason"] == ""
        assert p["body_len"] == 0 and p["charset"] == ""

    def test_content_type_spellings(self):
        cases = {
            "text/html; charset=UTF-8": ("text/html", "utf-8"),
            'text/html; charset="iso-8859-1"': ("text/html", "iso-8859-1"),
            "text/plain;charset=windows-1252": ("text/plain",
                                                "windows-1252"),
            "TEXT/HTML": ("text/html", ""),
            "application/json ; charset = utf-8": ("application/json",
                                                   "utf-8"),
        }
        for raw, want in cases.items():
            assert H.split_content_type(raw) == want, raw

    def test_truncated_body_flagged_not_fatal(self):
        body = b"x" * 100
        env = H.encode_http_response(
            200, "OK", [("Content-Length", "100")], body
        )
        cut = env[:-40]  # capture cut mid-body
        p = H.parse_http_response(cut)
        assert p["truncated"] is True
        assert p["body_len"] == 60  # clamped to what exists

    def test_overlong_body_clamped_to_declaration(self):
        env = H.encode_http_response(
            200, "OK", [("Content-Length", "5")], b"12345JUNKJUNK"
        )
        p = H.parse_http_response(env)
        assert not p["truncated"] and p["body_len"] == 5

    def test_malformed_framing_raises(self):
        for bad in [
            b"GET / HTTP/1.1\r\n\r\n",          # a request, not a response
            b"HTTP/1.1 20 OK\r\n\r\n",           # 2-digit status
            b"HTTP/1.1 abc OK\r\n\r\n",          # non-numeric status
            b"HTTP/1.1 200 OK\r\nNo: end",       # unterminated head
            b"HTTP/1.1 200 OK\r\nContent-Length: -1\r\n\r\n",
            b"HTTP/1.1 200 OK\r\nContent-Length: 1e3\r\n\r\n",
        ]:
            with pytest.raises(ValueError):
                H.parse_http_response(bad)

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=400))
    def test_total_on_arbitrary_bytes(self, blob):
        """Totality: random byte soup either parses (returning in-range
        offsets) or raises ValueError — never any other exception."""
        try:
            p = H.parse_http_response(blob)
        except ValueError:
            return
        assert 0 <= p["body_offset"] <= len(blob)
        assert 0 <= p["body_len"] <= len(blob) - p["body_offset"]

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=0, max_value=120), st.data())
    def test_total_on_truncated_valid_message(self, cut, data):
        """Every PREFIX of a valid message is handled: ValueError while
        the head is incomplete, truncated-flag once the head closed but
        the body is short, clean parse at full length."""
        doc_id = data.draw(st.integers(min_value=0, max_value=70))
        env, _ = H.synth_http_response(
            doc_id, f"https://p.org/{doc_id}", "prop body text"
        )
        prefix = env[: max(0, len(env) - cut)]
        try:
            p = H.parse_http_response(prefix)
        except ValueError:
            return
        assert p["body_offset"] + p["body_len"] <= len(prefix)
        if len(prefix) < len(env):
            assert p["truncated"] or p["body_len"] < len(
                env
            ) - p["body_offset"]

    def test_synth_digest_is_over_http_body(self):
        """ISO 28500 §5.9: WARC-Payload-Digest covers the HTTP BODY,
        not the record block — the digest must NOT hash the envelope
        head."""
        env, dig = H.synth_http_response(4, "https://d.org/4", "digest me")
        p = H.parse_http_response(env)
        body = env[p["body_offset"]: p["body_offset"] + p["body_len"]]
        assert dig == "md5:" + hashlib.md5(body).hexdigest()
        assert dig != "md5:" + hashlib.md5(env).hexdigest()


class TestWarcContentTypeHeader:
    def test_content_type_header_roundtrip(self):
        recs = [
            {"type": "response", "record_id": "urn:uuid:1",
             "uri": "https://c.org/1", "payload": b"HTTP/1.1 200 OK\r\n\r\nx",
             "content_type": H.HTTP_MSGTYPE_RESPONSE},
            {"type": "response", "record_id": "urn:uuid:2",
             "uri": "https://c.org/2", "payload": b"bare legacy text"},
        ]
        idx = W.parse_warc_index(W.encode_warc(recs))
        assert idx[0]["content_type"] == H.HTTP_MSGTYPE_RESPONSE
        assert idx[1]["content_type"] == ""


class TestHttpSparkOperators:
    def test_index_digest_ok_and_fields(self, spark):
        df = _docs_df(spark, 20)
        idx = H.http_response_index(H.attach_warc_http(df)).collect()
        assert len(idx) == 20
        assert all(r.digest_ok for r in idx)
        assert all(not r.truncated for r in idx)
        by_uri = {r.target_uri: r for r in idx}
        for i in range(1, 21):
            r = by_uri[f"https://s{i % 3}.org/d/{i}"]
            want_status = (404 if i % 7 == 3
                           else 301 if i % 7 == 5 else 200)
            assert r.status == want_status, i
            want_cs = {0: "utf-8", 1: "iso-8859-1", 2: "windows-1252",
                       3: "", 4: "utf-8"}[i % 5]
            assert r.charset == want_cs, i

    def test_body_extract_through_gzip(self, spark):
        """Text recovered through HTTP + gzip member + WARC framing
        combined, for the utf-8/undeclared classes."""
        df = _docs_df(spark, 20)
        got = {
            r.target_uri: r.text
            for r in H.http_body_extract(
                H.attach_warc_http(df, gzip_members=True)
            ).collect()
        }
        want = {
            f"https://s{i % 3}.org/d/{i}": f"Doc body {i} words here."
            for i in range(1, 21) if i % 5 in (0, 3, 4)
        }
        assert got == want

    def test_charset_transcode_recovers_decorated_text(self, spark):
        df = _docs_df(spark, 20)
        got = {
            r.target_uri: (r.charset, r.text)
            for r in H.http_charset_transcode(
                H.attach_warc_http(df)
            ).collect()
        }
        for i in range(1, 21):
            u = f"https://s{i % 3}.org/d/{i}"
            base = f"Doc body {i} words here."
            cs, text = got[u]
            if i % 5 == 1:
                assert cs == "iso-8859-1"
                assert text == base + H.LATIN1_SUFFIX
                assert "é" in text and "©" in text and "ñ" in text
            elif i % 5 == 2:
                assert cs == "windows-1252"
                assert text == base + H.CP1252_SUFFIX
                assert "€" in text and "™" in text
            else:
                assert text == base

    def test_redirect_edges(self, spark):
        df = _docs_df(spark, 20)
        got = sorted(
            (r.target_uri, r.status, r.location)
            for r in H.http_redirect_edges(H.attach_warc_http(df)).collect()
        )
        want = sorted(
            (f"https://s{i % 3}.org/d/{i}", 301,
             f"https://s{i % 3}.org/d/{i}/moved")
            for i in range(1, 21) if i % 7 == 5
        )
        assert got == want

    def test_container_bytes_never_shuffle(self, spark):
        """Scale pin (the warc_record_index posture): the executed plan
        moves envelope-index rows, not containers — exactly one
        MapInPandas fused walk downstream of the container build."""
        df = _docs_df(spark, 16)
        out = H.http_response_index(H.attach_warc_http(df))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert ("FlatMapGroupsInPandas" in plan
                or "FlatMapGroupsInArrow" in plan)
        assert plan.count("MapInPandas") == 1

    def test_non_http_records_skipped(self, spark):
        """A mixed container (legacy bare-payload responses without the
        application/http marker) must not reach the envelope parser."""
        d = spark.createDataFrame(
            [(1, "https://l.org/1", "legacy capture text")],
            "doc_id: long, url: string, text: string",
        )
        legacy = W.attach_warc(d)
        assert H.http_response_index(legacy).count() == 0
