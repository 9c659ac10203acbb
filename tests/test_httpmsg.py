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
            # smuggling shapes (round 12, r11 ADVICE): conflicting
            # repeats of the framing headers are rejected, not folded
            b"HTTP/1.1 200 OK\r\nContent-Length: 2\r\n"
            b"Content-Length: 5\r\n\r\nhello",
            b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n"
            b"Transfer-Encoding: identity\r\n\r\n0\r\n\r\n",
        ]:
            with pytest.raises(ValueError):
                H.parse_http_response(bad)
        # an IDENTICAL repeat is the spec-tolerated case and folds
        p = H.parse_http_response(
            b"HTTP/1.1 200 OK\r\nContent-Length: 2\r\n"
            b"Content-Length: 2\r\n\r\nhi"
        )
        assert p["body_len"] == 2 and not p["truncated"]

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


class TestWireCodings:
    """Round 11, second wave: chunked transfer coding + gzip content
    coding — decoded transport-first, representation-second, charset
    last (RFC 9112 §7.1 / RFC 9110 §8.4.1)."""

    def test_chunked_roundtrip(self):
        for body in [b"", b"x", b"a" * 15, b"b" * 16, b"c" * 33,
                     "é€™".encode("cp1252")]:
            assert H.decode_chunked(H.encode_chunked(body)) == body
        # multi-size chunks with an extension parameter
        framed = b"3;ext=1\r\nabc\r\n2\r\nde\r\n0\r\n\r\n"
        assert H.decode_chunked(framed) == b"abcde"

    def test_chunked_malformed_raises(self):
        import pytest as _pt

        for bad in [
            b"",                               # no size line
            b"3\r\nab\r\n0\r\n\r\n",           # truncated chunk data
            b"3\r\nabcXX0\r\n\r\n",            # missing chunk CRLF
            b"-1\r\n\r\n0\r\n\r\n",            # negative-spelled size
            b"zz\r\n\r\n0\r\n\r\n",            # non-hex size
            b"1\r\na\r\n",                     # missing last-chunk
            b"0\r\n",                          # missing trailer CRLF
            b"0\r\n\r\nJUNK",                  # bytes after last-chunk
            b"ffffffffffffffffff\r\n\r\n",     # size line too long
        ]:
            with _pt.raises(ValueError):
                H.decode_chunked(bad)

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=200))
    def test_chunked_total_on_arbitrary_bytes(self, blob):
        try:
            out = H.decode_chunked(blob)
        except ValueError:
            return
        assert len(out) <= len(blob)

    @settings(max_examples=150, deadline=None)
    @given(st.binary(max_size=120), st.integers(min_value=0,
                                                max_value=40))
    def test_chunked_total_on_truncated_valid(self, body, cut):
        framed = H.encode_chunked(body)
        prefix = framed[: max(0, len(framed) - cut)]
        try:
            out = H.decode_chunked(prefix)
        except ValueError:
            return
        assert out == body  # only the COMPLETE framing may succeed

    def test_decode_order_transfer_then_content(self):
        import gzip as _gz

        body = "ordér matters €".encode("cp1252")
        coded = H.encode_chunked(_gz.compress(body, mtime=0))
        env = {"headers": {"transfer-encoding": "chunked",
                           "content-encoding": "gzip"}}
        assert H.decode_http_body(env, coded) == body

    def test_unsupported_codings_raise(self):
        import pytest as _pt

        for hdrs in [{"transfer-encoding": "gzip"},
                     {"content-encoding": "br"}]:
            with _pt.raises(ValueError):
                H.decode_http_body({"headers": hdrs}, b"x")
        # identity spellings pass through untouched
        assert H.decode_http_body(
            {"headers": {"content-encoding": "identity"}}, b"ok"
        ) == b"ok"
        assert H.decode_http_body({"headers": {}}, b"ok") == b"ok"

    def test_deflate_both_spellings_decode(self):
        """Round 12: 'deflate' accepts the RFC 9110 zlib-wrapped stream
        AND the raw-deflate spelling legacy servers ship under the same
        token; corrupt/truncated streams raise (skip-row, never
        guessed)."""
        import zlib

        import pytest as _pt

        body = b"deflate me " * 30
        env = {"headers": {"content-encoding": "deflate"}}
        wrapped = zlib.compress(body, 6)
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        raw = co.compress(body) + co.flush()
        assert raw != wrapped
        assert H.decode_http_body(env, wrapped) == body
        assert H.decode_http_body(env, raw) == body
        with _pt.raises(ValueError):
            H.decode_http_body(env, wrapped[:-3])  # truncated
        with _pt.raises(ValueError):
            H.decode_http_body(env, b"\x00not deflate at all")
        with _pt.raises(ValueError):
            # trailing junk after a complete stream is rejected too
            H.decode_http_body(env, wrapped + b"junk")

    def test_plain_synth_unchanged_by_wire_flag(self):
        """wire_codings=False must produce byte-identical envelopes to
        the round-11 first wave — the six born entries' outputs pin on
        this."""
        for doc_id in range(20):
            a, da = H.synth_http_response(doc_id, "https://u.org/x", "t x")
            b, db = H.synth_http_response(
                doc_id, "https://u.org/x", "t x", wire_codings=False
            )
            assert a == b and da == db

    def test_spark_wire_decode_recovers_all_classes(self, spark):
        """Through chunked/gzip/identity × all charsets × WARC framing:
        the transcode recovers the decorated text for EVERY doc."""
        docs = [(i, f"https://w{i % 3}.org/{i}", f"Wire body {i} here.")
                for i in range(30)]
        df = spark.createDataFrame(
            docs, "doc_id: long, url: string, text: string"
        )
        got = {
            r.target_uri: r.text
            for r in H.http_charset_transcode(
                H.attach_warc_http(df, wire_codings=True)
            ).collect()
        }
        assert len(got) == 30
        for i, u, base in docs:
            want = base + (H.LATIN1_SUFFIX if i % 5 == 1
                           else H.CP1252_SUFFIX if i % 5 == 2 else "")
            assert got[u] == want, i

    def test_digest_covers_stored_coded_body(self):
        """ISO 28500: the payload digest is over the body AS STORED —
        for a coded body, the coded bytes."""
        env, dig = H.synth_http_response(
            5, "https://d.org/5", "stored form", wire_codings=True
        )  # 5 % 4 == 1 -> gzip content coding
        p = H.parse_http_response(env)
        stored = env[p["body_offset"]: p["body_offset"] + p["body_len"]]
        assert stored[:2] == b"\x1f\x8b"
        assert dig == "md5:" + hashlib.md5(stored).hexdigest()
        # and the deflate class: 7 % 4 == 3, (7 // 4) % 2 == 1 -> raw
        env7, dig7 = H.synth_http_response(
            7, "https://d.org/7", "stored form", wire_codings=True
        )
        p7 = H.parse_http_response(env7)
        assert p7["headers"]["content-encoding"] == "deflate"
        stored7 = env7[
            p7["body_offset"]: p7["body_offset"] + p7["body_len"]
        ]
        assert dig7 == "md5:" + hashlib.md5(stored7).hexdigest()


class TestCharsetSniffing:
    """WHATWG-lite encoding sniffing (HTML Standard §13.2.3.2, round
    13): BOM > Content-Type header > first-1024-bytes <meta> prescan >
    utf-8 default, with the spec's utf-16-meta-means-utf-8 nuance and
    the BOM excluded from content."""

    def test_bom_detection(self):
        assert H.sniff_bom(b"\xef\xbb\xbfhello") == ("utf-8", 3)
        assert H.sniff_bom(b"\xff\xfeh\x00") == ("utf-16le", 2)
        assert H.sniff_bom(b"\xfe\xff\x00h") == ("utf-16be", 2)
        assert H.sniff_bom(b"hello") == ("", 0)
        assert H.sniff_bom(b"") == ("", 0)

    def test_meta_prescan_spellings(self):
        for head, want in [
            (b'<meta charset="utf-8">', "utf-8"),
            (b"<meta charset=utf-8>", "utf-8"),
            (b"<meta charset = 'ISO-8859-1'>", "iso-8859-1"),
            (
                b'<meta http-equiv="Content-Type" content="text/html;'
                b' charset=windows-1252">',
                "windows-1252",
            ),
            (
                b"<meta http-equiv=content-type content=\"text/html;"
                b" charset=KOI8-R\">",
                "koi8-r",
            ),
            (b"<title>no declaration</title>", ""),
            (b"", ""),
        ]:
            assert H.sniff_meta_charset(head) == want, head

    def test_meta_x_user_defined_normalizes_to_cp1252(self):
        # HTML Standard §13.2.3.2 prescan rule
        assert (
            H.sniff_meta_charset(b"<meta charset=x-user-defined>")
            == "windows-1252"
        )
        # but a HEADER-declared x-user-defined stays outside the
        # allowlist (the rule is prescan-specific): drop-and-audit
        assert H.sniff_charset("x-user-defined", b"abc") == (
            "x-user-defined", "header", 0,
        )
        assert "x-user-defined" not in H.CHARSET_CODECS

    def test_meta_utf16_normalizes_to_utf8(self):
        # spec: a prescan that READ the declaration as ASCII bytes
        # disproves utf-16; charset becomes utf-8
        for label in (b"utf-16", b"UTF-16LE", b"utf-16be"):
            assert (
                H.sniff_meta_charset(b"<meta charset=" + label + b">")
                == "utf-8"
            )

    def test_meta_beyond_1024_bytes_ignored(self):
        head = b" " * 1025 + b"<meta charset=koi8-r>"
        assert H.sniff_meta_charset(head) == ""
        head = b"<html>" + b" " * 900 + b"<meta charset=koi8-r>"
        assert H.sniff_meta_charset(head) == "koi8-r"

    def test_precedence_golden(self):
        """The two disagreement goldens: BOM beats a mis-stating
        header; the header beats a mis-stating meta."""
        bom_body = b"\xef\xbb\xbfr\xc3\xa9sum\xc3\xa9"
        assert H.sniff_charset("iso-8859-1", bom_body) == (
            "utf-8", "bom", 3,
        )
        meta_body = b"<meta charset=utf-8>caf\xe9"
        assert H.sniff_charset("iso-8859-1", meta_body) == (
            "iso-8859-1", "header", 0,
        )
        assert H.sniff_charset("", meta_body) == ("utf-8", "meta", 0)
        assert H.sniff_charset("", b"plain") == ("", "default", 0)

    def test_sniff_operator_all_classes(self, spark):
        """The Spark operator over the six synthesis classes: every
        precedence arm occurs, non-ASCII decorations decode to the
        text the server meant, and the BOM never reaches content."""
        df = _docs_df(spark, 24)
        got = {
            r.target_uri: r
            for r in H.http_charset_sniff(
                H.attach_warc_http_sniff(df)
            ).collect()
        }
        assert len(got) == 24
        for i in range(1, 25):
            r = got[f"https://s{i % 3}.org/d/{i}"]
            base = f"Doc body {i} words here."
            c6 = i % 6
            if c6 == 0:
                assert (r.charset, r.source) == ("utf-8", "header")
                assert r.text == base
            elif c6 == 1:
                assert (r.charset, r.source) == (
                    "windows-1252", "meta",
                )
                assert r.text == H.META_CP1252 + base + H.CP1252_SUFFIX
                assert "€" in r.text and "™" in r.text
            elif c6 == 2:
                assert (r.charset, r.source) == ("iso-8859-1", "meta")
                assert r.text == (
                    H.META_HTTP_EQUIV_L1 + base + H.LATIN1_SUFFIX
                )
                assert "é" in r.text and "ñ" in r.text
            elif c6 == 3:
                assert (r.charset, r.source) == ("utf-8", "bom")
                assert r.text == base  # BOM stripped, header ignored
            elif c6 == 4:
                assert (r.charset, r.source) == (
                    "iso-8859-1", "header",
                )
                assert r.text == H.META_UTF8 + base + H.LATIN1_SUFFIX
            else:
                assert (r.charset, r.source) == ("", "default")
                assert r.text == base

    def test_utf16_bom_body_decodes_through_operator(self, spark):
        """A UTF-16LE BOM'd body (header silent) resolves via the BOM
        arm, the BOM bytes never reach content, and the text decodes
        through the utf-16-le allowlist codec."""
        text = "utf-16 content with é and €"
        body = b"\xff\xfe" + text.encode("utf-16-le")
        env = H.encode_http_response(
            200, "OK",
            [("Content-Type", "text/html"),
             ("Content-Length", str(len(body)))],
            body,
        )
        df = spark.createDataFrame(
            [(1, bytearray(W.encode_warc([{
                "type": "response",
                "record_id": "urn:test:u16",
                "uri": "https://ex.org/u16",
                "payload": env,
                "content_type": H.HTTP_MSGTYPE_RESPONSE,
            }])))],
            "container_id: long, container: binary",
        )
        rows = H.http_charset_sniff(df).collect()
        assert len(rows) == 1
        assert (rows[0].charset, rows[0].source) == ("utf-16le", "bom")
        assert rows[0].text == text

    def test_unknown_sniffed_label_drops_and_audits(self, spark):
        """A meta declaring a charset outside CHARSET_CODECS drops the
        row (never guess) while well-formed rows survive."""
        good = H.encode_http_response(
            200, "OK", [("Content-Type", "text/html")],
            b"<meta charset=utf-8>fine",
        )
        exotic = H.encode_http_response(
            200, "OK", [("Content-Type", "text/html")],
            b"<meta charset=x-mac-roman>weird",
        )
        recs = [
            {
                "type": "response",
                "record_id": f"urn:test:{i}",
                "uri": f"https://ex.org/{i}",
                "payload": p,
                "content_type": H.HTTP_MSGTYPE_RESPONSE,
            }
            for i, p in enumerate([good, exotic])
        ]
        df = spark.createDataFrame(
            [(1, bytearray(W.encode_warc(recs)))],
            "container_id: long, container: binary",
        )
        rows = H.http_charset_sniff(df).collect()
        assert len(rows) == 1
        assert rows[0].record_no == 0 and rows[0].source == "meta"


class TestRequestRecords:
    """Round 11, second wave: stored crawler requests paired with
    their responses via WARC-Concurrent-To (ISO 28500 §5.7)."""

    def test_request_parse_roundtrip(self):
        env = H.encode_http_request(
            "GET", "https://q.org/a?b=1", [("User-Agent", H.REQUEST_UA)]
        )
        p = H.parse_http_request(env)
        assert p["method"] == "GET"
        assert p["target"] == "https://q.org/a?b=1"
        assert p["headers"]["user-agent"] == H.REQUEST_UA

    def test_request_malformed_raises(self):
        for bad in [b"", b"GET /\r\n\r\n", b"get / HTTP/1.1\r\n\r\n",
                    b"GET / HTTP/2\r\n\r\n", b"GET / HTTP/1.1\r\nX: y"]:
            with pytest.raises(ValueError):
                H.parse_http_request(bad)

    def test_pairs_within_container_and_split_pair_dropped(self, spark):
        df = _docs_df(spark, 20)
        paired = H.http_request_pairs(
            H.attach_warc_http(df, with_requests=True)
        ).collect()
        assert len(paired) == 20
        for r in paired:
            assert r.method == "GET"
            assert r.req_target == r.target_uri
            i = int(r.target_uri.rsplit("/", 1)[-1])
            want = 404 if i % 7 == 3 else 301 if i % 7 == 5 else 200
            assert r.status == want
        # a container with a request whose response is absent yields
        # nothing (drop, never mispair)
        orphan = W.encode_warc([{
            "type": "request", "record_id": "urn:uuid:req-9",
            "uri": "https://o.org/9",
            "payload": H.encode_http_request("GET", "https://o.org/9", []),
            "content_type": H.HTTP_MSGTYPE_REQUEST,
            "concurrent_to": "urn:uuid:9",
        }])
        one = spark.createDataFrame(
            [(0, bytearray(orphan))], "container_id: long, container: binary"
        )
        assert H.http_request_pairs(one).count() == 0

    def test_request_records_invisible_to_response_operators(self, spark):
        """The response-side operators must skip msgtype=request
        records — same outputs with and without stored requests."""
        df = _docs_df(spark, 12)
        plain = {(r.target_uri, r.status, r.body_len)
                 for r in H.http_response_index(
                     H.attach_warc_http(df)).collect()}
        withreq = {(r.target_uri, r.status, r.body_len)
                   for r in H.http_response_index(
                       H.attach_warc_http(df, with_requests=True)
                   ).collect()}
        assert plain == withreq


class TestServerNotModifiedRevisits:
    """Round 11, second wave: ISO 28500 §6.7.1 — revisits based on a
    conditional re-fetch the server answered 304 Not Modified."""

    def _caps(self, spark):
        # docs 0-11; docs 0-3 re-captured identically at id+100
        rows = [(i, f"https://r.org/{i}", f"Rev body {i}.")
                for i in range(12)]
        rows += [(100 + i, f"https://r.org/{i}", f"Rev body {i}.")
                 for i in range(4)]
        return spark.createDataFrame(
            rows, "capture_id: long, url: string, text: string"
        )

    def test_record_framing(self, spark):
        """Revisit records carry WARC-Profile, Refers-To, the
        ORIGINAL's payload digest, and a bodiless 304 envelope; keepers
        carry full 200s with the ETag the conditional validated."""
        caps = H.attach_warc_http_revisits(self._caps(spark))
        recs = []
        for r in caps.collect():
            recs += W.parse_warc_index(bytes(r.container))
        by_id = {int(r["record_id"].rsplit(":", 1)[-1]): r for r in recs}
        assert len(by_id) == 16
        for i in range(4):
            rev = by_id[100 + i]
            assert rev["warc_type"] == "revisit"
            assert rev["profile"] == H.PROFILE_NOT_MODIFIED
            assert rev["refers_to"] == f"urn:uuid:{i}"
            keeper = by_id[i]
            assert rev["payload_digest"] == keeper["payload_digest"]
        # envelope statuses parse as the server sent them
        env_rev = H.parse_http_response(
            b"HTTP/1.1 304 Not Modified\r\nETag: \"x\"\r\n\r\n"
        )
        assert env_rev["status"] == 304 and env_rev["body_len"] == 0

    def test_resolve_rehydrates_and_reports_status(self, spark):
        got = {
            r.capture_id: (r.is_revisit, r.status, r.text)
            for r in H.http_revisit_resolve(
                H.attach_warc_http_revisits(self._caps(spark))
            ).collect()
        }
        assert len(got) == 16
        for i in range(12):
            assert got[i] == (False, 200, f"Rev body {i}.")
        for i in range(4):
            assert got[100 + i] == (True, 304, f"Rev body {i}.")


class TestTruncatedRecords:
    """Round 11, second wave: ISO 28500 §5.13 — captures cut by length
    policy, with BOTH truncation signals (WARC header + HTTP
    declared-vs-available) agreeing."""

    def test_truncated_record_framing_and_flags(self, spark):
        # ids 1..24: 4 and 15 hit %11 == 4; bodies are > 40 bytes so
        # the cut policy drops real bytes
        rows = [
            (i, f"https://s{i % 3}.org/d/{i}",
             f"Doc body {i} padded out well past the forty byte mark.")
            for i in range(1, 25)
        ]
        df = spark.createDataFrame(
            rows, "doc_id: long, url: string, text: string"
        )
        idx = {
            r.target_uri: r
            for r in H.http_response_index(
                H.attach_warc_http(df, with_truncation=True)
            ).collect()
        }
        assert len(idx) == 24
        for i in range(1, 25):
            r = idx[f"https://s{i % 3}.org/d/{i}"]
            if i % 11 == 4:
                assert r.truncated and r.warc_truncated == "length"
                assert r.body_len == H.TRUNCATE_BODY_AT
            else:
                assert not r.truncated and r.warc_truncated == ""
            # the §5.9 digest verifies over the STORED (cut) body
            assert r.digest_ok, i

    def test_short_body_not_marked(self, spark):
        """A body already within the policy stores whole: no cut, no
        WARC-Truncated header, no HTTP truncation flag."""
        df = spark.createDataFrame(
            [(4, "https://t.org/4", "short.")],  # 4 % 11 == 4
            "doc_id: long, url: string, text: string",
        )
        r = H.http_response_index(
            H.attach_warc_http(df, with_truncation=True)
        ).collect()[0]
        assert not r.truncated and r.warc_truncated == ""
        assert r.body_len == len("short.") and r.digest_ok

    def test_untruncated_synth_unchanged(self, spark):
        """with_truncation=False must produce byte-identical containers
        — the already-attested entries pin on this."""
        df = _docs_df(spark, 8)
        a = H.attach_warc_http(df).collect()
        b = H.attach_warc_http(df, with_truncation=False).collect()
        assert {(r.container_id, bytes(r.container)) for r in a} == {
            (r.container_id, bytes(r.container)) for r in b
        }


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

    def test_malformed_envelope_record_is_skipped_not_fatal(self, spark):
        """One smuggling-shaped record (conflicting Content-Length
        repeats) inside a container must NOT abort the walk (r12
        ADVICE): http_response_index, http_capture_index, and the
        body-extract path all survive and emit the well-formed
        records; parse_http_response direct callers still raise."""
        good = H.encode_http_response(
            200, "OK",
            [("Content-Type", "text/plain; charset=utf-8")],
            b"fine body",
        )
        evil = (
            b"HTTP/1.1 200 OK\r\nContent-Length: 2\r\n"
            b"Content-Length: 5\r\n\r\nhello"
        )
        with pytest.raises(ValueError):
            H.parse_http_response(evil)
        recs = [
            {
                "type": "response",
                "record_id": f"urn:test:{i}",
                "uri": f"https://ex.org/{i}",
                "payload": p,
                "content_type": "application/http; msgtype=response",
                "payload_digest": "md5:"
                + hashlib.md5(
                    p[p.find(b"\r\n\r\n") + 4:]
                ).hexdigest(),
            }
            for i, p in enumerate([good, evil, good])
        ]
        df = spark.createDataFrame(
            [(1, bytearray(W.encode_warc(recs)))],
            "container_id: long, container: binary",
        )
        idx = H.http_response_index(df).collect()
        assert [r.record_no for r in idx] == [0, 2]
        assert all(r.status == 200 and r.digest_ok for r in idx)
        cap = H.http_capture_index(df).collect()
        assert [r.record_no for r in cap] == [0, 2]

    def test_capture_index_framing_and_body_digest(self, spark):
        """http_capture_index (round 12): the fused walk's framing
        facts agree with warc_record_index over the same containers,
        and payload_md5 is the §5.9 BODY digest — it equals the md5 of
        the bytes body_extract recovers (utf-8 classes) and matches
        each record's WARC-Payload-Digest header."""
        df = _docs_df(spark, 20)
        containers = H.attach_warc_http(df).cache()
        cap = {
            (r.container_id, r.record_no): r
            for r in H.http_capture_index(containers).collect()
        }
        assert len(cap) == 20
        from pgferry_spark.sources import warc as W

        frame = {
            (r.container_id, r.record_no): r
            for r in W.warc_record_index(containers).collect()
        }
        for k, c in cap.items():
            f = frame[k]
            assert (c.rec_offset, c.rec_len, c.target_uri) == (
                f.rec_offset, f.rec_len, f.target_uri
            )
        # digest == md5 of the recovered body text for utf-8 classes
        texts = {
            (r.container_id, r.record_no): r.text
            for r in H.http_body_extract(containers).collect()
        }
        n_checked = 0
        for k, t in texts.items():
            assert cap[k].payload_md5 == hashlib.md5(
                t.encode()
            ).hexdigest()
            n_checked += 1
        assert n_checked > 0
        # and equals the record's own WARC-Payload-Digest header value
        blob = bytes(containers.collect()[0].container)
        for rec in W.parse_warc_index(blob):
            cid = int(rec["record_id"].rsplit(":", 1)[-1]) // 8
            got = cap[(cid, rec["record_no"])].payload_md5
            assert rec["payload_digest"] == "md5:" + got
        containers.unpersist()

    def test_charset_allowlist_extended_codecs(self, spark):
        """Round 12: the rest of the high-frequency crawl charset
        declarations (CJK / cyrillic / ISO-8859 family / utf-16)
        transcode through their exact stdlib codecs; an unknown
        declaration still drops-and-audits, never guesses."""
        from pgferry_spark.sources.warc import encode_warc

        cases = [
            ("shift_jis", "日本語のページです"),
            ("euc-jp", "これも日本語"),
            ("euc-kr", "한국어 페이지"),
            ("gbk", "中文网页内容"),
            ("gb2312", "简体中文"),
            ("big5", "繁體中文網頁"),
            ("koi8-r", "русская страница"),
            ("windows-1251", "кириллица здесь"),
            ("iso-8859-2", "zażółć gęślą jaźń"),
            ("windows-1250", "příliš žluťoučký"),
            ("iso-8859-15", "prix: 12€"),
            ("utf-16", "utf sixteen page"),
            ("utf-16le", "little endian"),
            ("utf-16be", "big endian"),
        ]
        import codecs as _codecs

        from pgferry_spark.sources.httpmsg import CHARSET_CODECS

        recs = []
        for i, (cs, text) in enumerate(cases):
            body = text.encode(_codecs.lookup(CHARSET_CODECS[cs]).name)
            env = H.encode_http_response(
                200, "OK",
                [("Content-Type", f"text/html; charset={cs}"),
                 ("Content-Length", str(len(body)))],
                body,
            )
            recs.append(
                {
                    "type": "response",
                    "record_id": f"urn:uuid:{i}",
                    "uri": f"https://cs.org/{i}",
                    "payload": env,
                    "content_type": H.HTTP_MSGTYPE_RESPONSE,
                    "payload_digest": "md5:"
                    + hashlib.md5(body).hexdigest(),
                }
            )
        # one record with an off-allowlist declaration: dropped
        bad = H.encode_http_response(
            200, "OK",
            [("Content-Type", "text/html; charset=ebcdic-fr"),
             ("Content-Length", "2")],
            b"xx",
        )
        recs.append(
            {
                "type": "response",
                "record_id": "urn:uuid:99",
                "uri": "https://cs.org/99",
                "payload": bad,
                "content_type": H.HTTP_MSGTYPE_RESPONSE,
                "payload_digest": "md5:" + hashlib.md5(b"xx").hexdigest(),
            }
        )
        df = spark.createDataFrame(
            [(0, bytearray(encode_warc(recs)))],
            "container_id: long, container: binary",
        )
        got = {
            r.target_uri: (r.charset, r.text)
            for r in H.http_charset_transcode(df).collect()
        }
        for i, (cs, text) in enumerate(cases):
            assert got[f"https://cs.org/{i}"] == (cs, text), cs
        assert "https://cs.org/99" not in got  # unknown: drop-and-audit

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
