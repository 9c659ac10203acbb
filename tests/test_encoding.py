"""Encoding repair (operators/encoding.py): the ftfy-style mojibake
table — generated from the real UTF-8→cp1252 round trip — and the
sentinel-framed repair chain."""

import pytest


class TestMojibakeTable:
    def test_pairs_are_true_round_trips(self):
        """Every (pattern, target) is exactly what reading the target's
        UTF-8 bytes as cp1252 produces — correct by construction, and
        this pins the construction."""
        from pgferry_spark.operators.encoding import MOJIBAKE_PAIRS

        assert len(MOJIBAKE_PAIRS) >= 30
        for moji, ch in MOJIBAKE_PAIRS:
            assert moji == ch.encode("utf-8").decode("cp1252")
            # SQL-literal safety: no quote/backslash/control bytes
            assert "'" not in moji and "'" not in ch
            assert "\\" not in moji

    def test_cp1252_holes_skipped(self):
        """U+201D (right double quote) encodes through 0x9D — a cp1252
        hole — so it must NOT be in the table."""
        from pgferry_spark.operators.encoding import MOJIBAKE_PAIRS

        assert "”" not in {ch for _, ch in MOJIBAKE_PAIRS}

    def test_longest_first(self):
        from pgferry_spark.operators.encoding import MOJIBAKE_PAIRS

        lens = [len(m) for m, _ in MOJIBAKE_PAIRS]
        assert lens == sorted(lens, reverse=True)


class TestMojibakeOperators:
    def test_stats_counts_and_flags(self, spark):
        from pgferry_spark.operators.encoding import mojibake_stats

        rows = [
            (1, "clean text with no corruption at all."),
            (2, "x " + " café — résumé…".encode("utf-8").decode("cp1252")),
            (3, "legitimate Ã on its own is not counted"),
        ]
        df = spark.createDataFrame(rows, "doc_id: long, text: string")
        got = {r.doc_id: (r.n_mojibake, r.has_mojibake)
               for r in mojibake_stats(df, "text", "doc_id").collect()}
        assert got[1] == (0, False)
        assert got[2] == (5, True)  # é, —, é, é, …
        assert got[3] == (0, False)  # gate over-approximates, count doesn't

    def test_repair_recovers_intended_text(self, spark):
        from pgferry_spark.operators.encoding import mojibake_repair

        intended = "El niño comió — «crème brûlée»… 25° §"
        # §: UTF-8 0xC2 0xA7 -> 'Â§' is NOT in the table (kept small);
        # everything tabled must repair, the rest must survive untouched
        corrupted = intended.encode("utf-8").decode("cp1252")
        df = spark.createDataFrame(
            [(1, corrupted), (2, "already clean.")],
            "doc_id: long, text: string",
        )
        got = {r.doc_id: r.text
               for r in mojibake_repair(df, "text", "doc_id").collect()}
        assert got[2] == "already clean."
        out = got[1]
        for ch in ("ñ", "ó", "—", "«", "»", "è", "û", "…", "°"):
            assert ch in out, ch
        # untabled 'Â§' passes through as-is (no false repair)
        assert "Â§" in out

    def test_pattern_chars_as_targets_no_double_decode(self, spark):
        """'€' is both a repair TARGET and a cp1252 PATTERN char: a
        produced '€' adjacent to original 'â'/'¬' must never splice
        into a second match (the charref sentinel lesson)."""
        from pgferry_spark.operators.encoding import mojibake_repair

        # 'â‚¬' -> '€'; surround with the other two bytes of the €
        # pattern so naive sequential replace could re-match
        tricky = "ââ‚¬¬ and â„¢ again â‚¬"
        df = spark.createDataFrame(
            [(1, tricky)], "doc_id: long, text: string"
        )
        out = mojibake_repair(df, "text", "doc_id").collect()[0].text
        assert out == "â€¬ and ™ again €"

    def test_forged_sentinel_bytes_stripped(self, spark):
        from pgferry_spark.operators.encoding import mojibake_repair

        df = spark.createDataFrame(
            [(1, "a\x01b\x02c Ã©")], "doc_id: long, text: string"
        )
        out = mojibake_repair(df, "text", "doc_id").collect()[0].text
        assert out == "abc é"

    def test_plan_map_only(self, spark):
        from pgferry_spark.operators.encoding import (
            mojibake_repair,
            mojibake_stats,
        )

        df = spark.createDataFrame(
            [(1, "x")], "doc_id: long, text: string"
        )
        for op in (mojibake_stats, mojibake_repair):
            plan = (
                op(df, "text", "doc_id")
                ._jdf.queryExecution().executedPlan().toString()
            )
            assert "Exchange" not in plan


class TestUtf8Sanity:
    def test_counts_and_verdict(self, spark):
        from pgferry_spark.operators.encoding import utf8_sanity_flags

        rows = [
            (1, "perfectly clean text, tabs\tand\nnewlines allowed."),
            (2, "lost bytes � here � and � there"),
            (3, "bell\x07 and nul\x00 and unit sep\x1f and del\x7f"),
            (4, "mixed �\x07"),
        ]
        df = spark.createDataFrame(rows, "doc_id: long, text: string")
        got = {r.doc_id: (r.n_replacement, r.n_control, r.passes)
               for r in utf8_sanity_flags(df, "text", "doc_id").collect()}
        assert got[1] == (0, 0, True)   # \t \n are NOT controls here
        assert got[2] == (3, 0, False)
        assert got[3] == (0, 4, False)
        assert got[4] == (1, 1, False)

    def test_plan_map_only(self, spark):
        from pgferry_spark.operators.encoding import utf8_sanity_flags

        df = spark.createDataFrame([(1, "x")], "doc_id: long, text: string")
        plan = (
            utf8_sanity_flags(df, "text", "doc_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
