"""Encoding repair — ftfy-style mojibake detection and fixing.

The most common corruption in web-crawl text is UTF-8 bytes decoded as
Windows-1252/Latin-1 ("mojibake"): 'é' (0xC3 0xA9) surfaces as 'Ã©',
'’' (0xE2 0x80 0x99) as 'â€™'.  CCNet/OSCAR-style pipelines run an
encoding-repair pass before any quality scoring, because mojibake
poisons language ID, token counts, and dedup fingerprints alike.

This module implements the deterministic core of that pass as a bounded
literal table — NOT a general chardet: the table is generated at import
from the actual round trip ``target.encode('utf-8').decode('cp1252')``
for a curated set of high-frequency targets (accented Latin letters,
typographic punctuation, currency/legal symbols), so every entry is
correct by construction.  Targets whose UTF-8 bytes hit the five
cp1252 holes (0x81/0x8D/0x8F/0x90/0x9D — e.g. the right double quote)
are skipped automatically: their mojibake forms are not valid cp1252
text and round-tripping them is ambiguous.

Double-decode safety reuses the charref lesson
(``operators/html.py:115``): each replace emits its target framed in
chr(1)…chr(2) sentinels so a production can never splice with
surrounding text into a pattern a later replace would match (several
targets — €, ™, © — are themselves cp1252 PATTERN characters); raw
sentinel bytes are stripped from the input first so frames cannot be
forged, and the frames unwrap once at the end.

Scale shape: both operators are single-projection map-only column
expressions (plain non-regex replaces, one cheap scan each) gated on a
``contains`` probe of the three possible lead bytes — pages without
mojibake skip the whole table.  Zero shuffle; at 100 TB this is
scan-bound exactly like the HTML strip stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# High-frequency repair targets: accented Latin letters (the French/
# Spanish/German/Portuguese set), typographic punctuation, and the
# symbols that ride marketing/legal boilerplate.  The right double
# quote (U+201D) is skipped by the generator — its middle byte 0x9D is
# a cp1252 hole.
MOJIBAKE_TARGETS = (
    "é", "è", "ê", "ë", "á", "à", "â", "ã", "ó", "ô", "õ", "ò", "ú",
    "ù", "û", "í", "ì", "î", "ï", "ñ", "ç", "ü", "ö", "ä", "ß", "ø",
    "å",
    "–", "—", "…", "‘", "’", "“",
    "€", "™", "©", "®", "«", "»", "°", "±",
)


def _mojibake_pairs() -> tuple[tuple[str, str], ...]:
    pairs = []
    for ch in MOJIBAKE_TARGETS:
        try:
            moji = ch.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:
            continue  # cp1252 hole byte: mojibake form is ambiguous
        pairs.append((moji, ch))
    # longest pattern first: a 3-byte sequence ('â€™') must never lose
    # its tail to a shorter pattern that happens to prefix it
    pairs.sort(key=lambda p: (-len(p[0]), p[0]))
    return tuple(pairs)


MOJIBAKE_PAIRS = _mojibake_pairs()

# every mojibake spelling leads with one of these cp1252 bytes (0xC3,
# 0xC2, 0xE2 decoded) — the cheap page-level gate
_LEAD_CHARS = tuple(sorted({p[0][0] for p in MOJIBAKE_PAIRS}))


def mojibake_flag_sql(col: str) -> str:
    """Gate probe: does the page carry any possible mojibake lead
    char?  Over-approximates (a legitimate 'Ã' gates too) — the table
    then matches or doesn't; the gate only buys the skip."""
    return "(" + " OR ".join(
        f"contains({col}, '{c}')" for c in _LEAD_CHARS
    ) + ")"


def mojibake_count_sql(col: str) -> str:
    """Occurrence count across the whole table: per pattern,
    (length(x) - length(replace(x, p, ''))) / len(p) — character
    semantics on both engines.  One scan per pattern, no regex.
    The division goes through DOUBLE then casts: the diff is an exact
    multiple of the 2/3-char pattern length, so the double is an exact
    integer and Spark's truncating cast agrees with DuckDB's rounding
    one ('//' vs 'div' would be the engine-divergent spelling)."""
    terms = [
        f"CAST((length({col}) - length(replace({col}, '{moji}', '')))"
        f" / {len(moji)} AS INT)"
        for moji, _ in MOJIBAKE_PAIRS
    ]
    return "(" + " + ".join(terms) + ")"


def mojibake_repair_sql(col: str) -> str:
    """The repair chain: strip forgeable raw sentinel bytes, apply the
    table longest-first with sentinel-framed productions, unwrap the
    frames once.  Gated on the lead-char probe so clean pages pass
    through as the identity."""
    x = f"replace(replace({col}, chr(1), ''), chr(2), '')"
    for moji, ch in MOJIBAKE_PAIRS:
        lit = "chr(39)" if ch == "'" else f"'{ch}'"
        x = f"replace({x}, '{moji}', chr(1) || {lit} || chr(2))"
    x = f"replace(replace({x}, chr(1), ''), chr(2), '')"
    return f"CASE WHEN {mojibake_flag_sql(col)} THEN {x} ELSE {col} END"


# deterministic decoration for the clean synthetic corpus: one class
# with letter mojibake, one with punctuation/symbol mojibake, one
# clean.  The injected spellings are exactly what the cp1252 round
# trip produces for ' café — résumé…' and ' «quote» ‘word’
# 25°' — appended, so the base text is untouched.
MOJIBAKE_SYNTH_SQL = (
    "CASE WHEN {id} % 3 = 0 THEN {txt} ||"
    " ' cafÃ© â€” rÃ©sumÃ©â€¦'"
    " WHEN {id} % 3 = 1 THEN {txt} ||"
    " ' Â«quoteÂ» â€˜wordâ€™ 25Â°'"
    " ELSE {txt} END"
)


# UTF-8 sanity census — the OSCAR/CCNet "encoding error" pre-filter,
# complementary to the mojibake table: mojibake is VALID UTF-8 decoded
# through the wrong charset; these signals catch text whose decode
# already LOST bytes (U+FFFD replacement characters) or that carries
# raw C0 control bytes (everything except \t \n \r, plus DEL) — the
# fingerprint of binary junk, truncated multibyte sequences, and
# terminal escape litter.  Pages failing this gate are DROP candidates;
# no repair recovers a replacement character's original bytes.
UTF8_REPLACEMENT = "�"
UTF8_CONTROL_POINTS = tuple(
    [*range(0, 9), 11, 12, *range(14, 32), 127]
)


def utf8_sanity_sql(col: str) -> tuple[str, str]:
    """(n_replacement, n_control) count expressions — literal
    replace-diffs only, one scan per character (the mojibake_count
    pattern; no regex, because character-class escape spellings diverge
    between the engines' string-literal rules).  U+FFFD rides as a
    verbatim character (Spark's chr() is mod-256 and cannot spell it);
    the control points ride chr(p), identical on both engines below
    128."""
    n_repl = (
        f"(length({col}) - length(replace({col}, '{UTF8_REPLACEMENT}', '')))"
    )
    ctrl_terms = [
        f"(length({col}) - length(replace({col}, chr({p}), '')))"
        for p in UTF8_CONTROL_POINTS
    ]
    return n_repl, "(" + " + ".join(ctrl_terms) + ")"


# deterministic decoration: replacement-only, control-only, mixed, and
# clean classes (controls via chr(): BEL, SUB, US — never the chr(1)
# sentinel, which the repair chain strips by design)
UTF8_SYNTH_SQL = (
    "CASE WHEN {id} % 4 = 0 THEN {txt} || ' �de�'"
    " WHEN {id} % 4 = 1 THEN {txt} || chr(7) || 'x' || chr(26)"
    " WHEN {id} % 4 = 2 THEN {txt} || '�' || chr(31)"
    " ELSE {txt} END"
)


def utf8_sanity_flags(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Per-document encoding-error census: ``(id, n_replacement,
    n_control, passes)`` where ``passes`` is the OSCAR-style clean
    verdict (zero replacement characters, zero raw controls).
    Map-only literal scans, zero shuffle — scan-bound at 100 TB like
    the other flag tables."""
    n_repl_sql, n_ctrl_sql = utf8_sanity_sql(text_col)
    n_repl = F.expr(n_repl_sql).cast("int")
    n_ctrl = F.expr(n_ctrl_sql).cast("int")
    return df.select(
        F.col(id_col),
        n_repl.alias("n_replacement"),
        n_ctrl.alias("n_control"),
        ((n_repl == 0) & (n_ctrl == 0)).alias("passes"),
    )


def mojibake_stats(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Per-document mojibake census: ``(id, n_mojibake,
    has_mojibake)`` — the signal a curation pipeline uses to route
    pages through repair (or drop pages so corrupted the repair would
    be lipstick).  Map-only; one row per document."""
    n = F.expr(mojibake_count_sql(text_col)).cast("int")
    return df.select(
        F.col(id_col),
        n.alias("n_mojibake"),
        (n > 0).alias("has_mojibake"),
    )


def mojibake_repair(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Repaired text: ``(id, text)`` with every table spelling decoded
    back to its intended character.  The sentinel framing guarantees
    each corrupted sequence decodes exactly once even where targets
    are themselves pattern characters."""
    return df.select(
        F.col(id_col),
        F.expr(mojibake_repair_sql(text_col)).alias("text"),
    )
