"""Property-based tests (hypothesis) over the pure planning/parsing layers.

The reference is table-driven only (SURVEY §5); these add the invariants a
planner must hold for EVERY input, not just the curated cases.
"""

from hypothesis import example, given, settings
from hypothesis import strategies as st

from pgferry_spark.catalog.identifiers import to_snake_case, truncate_identifier
from pgferry_spark.catalog.parsers import parse_enum_values, split_sql_statements
from pgferry_spark.plans.chunk import INT64_MAX, INT64_MIN, plan_chunks

keys = st.integers(min_value=INT64_MIN // 2, max_value=INT64_MAX)


@settings(max_examples=300, deadline=None)
@given(
    lo=keys,
    span=st.integers(min_value=0, max_value=100_000),
    size=st.integers(min_value=1, max_value=1_000_000),
)
def test_chunks_exactly_partition_the_key_space(lo, span, size):
    """Chunks tile [min, max] with no gaps, no overlaps, full coverage."""
    hi = min(lo + span, INT64_MAX)
    chunks = plan_chunks(lo, hi, size)
    assert chunks[0].lo == lo
    assert chunks[-1].hi == hi and chunks[-1].is_last
    for a, b in zip(chunks, chunks[1:]):
        assert not a.is_last
        assert a.hi == b.lo  # adjacent: half-open ranges tile exactly
    for c in chunks[:-1]:
        assert c.lo < c.hi
    assert chunks[-1].lo <= chunks[-1].hi


@settings(max_examples=300, deadline=None)
@given(
    lo=keys,
    span=st.integers(min_value=0, max_value=100_000),
    size=st.integers(min_value=1, max_value=1_000_000),
    probe=st.integers(min_value=0, max_value=10_000_000),
)
def test_every_key_lands_in_exactly_one_chunk(lo, span, size, probe):
    hi = min(lo + span, INT64_MAX)
    key = lo + (probe % (span + 1)) if span else lo
    if key > hi:
        key = hi
    chunks = plan_chunks(lo, hi, size)
    holders = [
        c for c in chunks
        if c.lo <= key and (key <= c.hi if c.is_last else key < c.hi)
    ]
    assert len(holders) == 1


@settings(max_examples=200)
@given(st.text(min_size=0, max_size=40))
@example("ᾨ")  # U+1FA8, category Lt: istitle() but not isupper() (r11 verdict)
@example("ᾨmega")
@example("Džungla")  # U+01C5 Dž, Lt digraph
def test_snake_case_idempotent_and_lowercase(name):
    once = to_snake_case(name)
    assert to_snake_case(once) == once  # fixpoint
    assert once == once.lower()


@settings(max_examples=200)
@given(st.text(min_size=0, max_size=120))
def test_truncate_identifier_bounded_and_deterministic(name):
    out = truncate_identifier(name)
    assert len(out) <= 63
    assert truncate_identifier(name) == out
    if len(name) <= 63:
        assert out == name


@settings(max_examples=200)
@given(st.lists(st.text(alphabet=st.characters(blacklist_characters="\x00"), max_size=10), min_size=1, max_size=6))
def test_enum_roundtrip(values):
    """Rendering an enum declaration and parsing it back is the identity."""
    rendered = "enum(" + ",".join("'" + v.replace("\\", "\\\\").replace("'", "''") + "'" for v in values) + ")"
    assert parse_enum_values(rendered) == values


@settings(max_examples=200)
@given(st.lists(st.from_regex(r"[A-Za-z0-9_ =<>]{1,20}", fullmatch=True), min_size=0, max_size=6))
def test_splitter_preserves_statement_count(stmts):
    sql = "; ".join(stmts) + (";" if stmts else "")
    out = split_sql_statements(sql)
    expected = [s.strip() for s in stmts if s.strip()]
    assert out == expected


# --- ANN probe metadata (pure driver functions) ----------------------------

vecs_st = st.lists(
    st.lists(
        st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
        min_size=4, max_size=4,
    ),
    min_size=2, max_size=12,
)


@settings(max_examples=150, deadline=None)
@given(cents=vecs_st, q=st.lists(
    st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
    min_size=4, max_size=4,
))
def test_ivf_query_cells_prefix_consistent_and_distinct(cents, q):
    """nprobe=k returns k distinct cells; shorter probes are prefixes of
    longer ones (the ranking is total); the first equals the single-cell
    choice."""
    from pgferry_spark.operators.similarity import (
        ivf_query_cell, ivf_query_cells,
    )

    n = len(cents)
    full = ivf_query_cells(cents, q, nprobe=n)
    assert sorted(full) == list(range(n))  # a permutation: no dup, no gap
    assert full[0] == ivf_query_cell(cents, q)
    for k in range(1, n):
        assert ivf_query_cells(cents, q, nprobe=k) == full[:k]


@settings(max_examples=150, deadline=None)
@given(data=st.data())
def test_pq_adc_tables_nonnegative_and_zero_on_self(data):
    """Every ADC entry is a nonneg rounded distance; a query equal to a
    codebook row scores 0 at that row in every subspace."""
    from pgferry_spark.operators.similarity import pq_adc_tables

    k = data.draw(st.integers(min_value=2, max_value=6))
    d = data.draw(st.integers(min_value=2, max_value=4))
    m = data.draw(st.integers(min_value=1, max_value=3))
    f = st.floats(min_value=-5, max_value=5, allow_nan=False, width=32)
    books = [
        [[data.draw(f) for _ in range(d)] for _ in range(k)] for _ in range(m)
    ]
    pick = data.draw(st.integers(min_value=0, max_value=k - 1))
    q = [x for b in books for x in b[pick]]
    tables = pq_adc_tables(books, q)
    assert len(tables) == m and all(len(t) == k for t in tables)
    assert all(x >= 0.0 for t in tables for x in t)
    assert all(t[pick] == 0.0 for t in tables)


# --- round 4: pure-codec invariants -----------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=24),
    data=st.data(),
)
def test_png_roundtrip_any_image(w, h, data):
    """encode→decode is the identity on (w, h, pixel_sum) for EVERY 8-bit
    grayscale image, not just the arithmetic-law fixtures."""
    from pgferry_spark.multimodal.ops import encode_png_gray, parse_png_meta

    px = bytes(
        data.draw(st.lists(st.integers(0, 255), min_size=w * h, max_size=w * h))
    )
    meta = parse_png_meta(encode_png_gray(w, h, px))
    assert (meta["width"], meta["height"]) == (w, h)
    assert meta["pixel_sum"] == sum(px)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=8, max_value=32),
    h=st.integers(min_value=8, max_value=24),
    shift=st.integers(min_value=1, max_value=100),
    data=st.data(),
)
def test_ahash_brightness_shift_invariant(w, h, shift, data):
    """aHash must be EXACTLY invariant under a global brightness offset:
    block_sum·npx > total·bpx  ⟺  (block_sum+c·bpx)·npx > (total+c·npx)·bpx
    — the algebraic reason the comparison is exact integer math, held for
    every image and every offset that doesn't clip."""
    from pgferry_spark.multimodal.ops import ahash_bits

    base = data.draw(
        st.lists(st.integers(0, 255 - 100), min_size=w * h, max_size=w * h)
    )
    shifted = [p + shift for p in base]
    assert ahash_bits(w, h, bytes(base)) == ahash_bits(
        w, h, bytes(shifted)
    )


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=5000),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_wav_duration_exact(n, rate):
    from pgferry_spark.multimodal.ops import encode_wav_pcm16, parse_wav_meta

    meta = parse_wav_meta(encode_wav_pcm16([0] * n, sample_rate=rate))
    assert meta["duration_ms"] == (n * 2 * 1000) // (rate * 2)
    assert meta["sample_rate"] == rate


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=-300000, max_value=300000))
def test_signed_4dp_rounding_matches_sql_round(micro):
    """Regression guard for the round-4 signed-rounding fix: the Arrow/
    driver formula trunc(y ± 0.5)/1e4 must equal the ORACLE ENGINE's
    ROUND(x, 4) — half-away-from-zero applied to the binary double, the
    thing both sides actually compute on — for positive AND negative
    values. (floor(y − 0.5) rounded EVERY negative fraction away, not
    just halves — the bug hard_negatives surfaced. And a Decimal-of-repr
    reference would itself diverge: engines round the double, not the
    decimal string.)"""
    import math

    import duckdb
    import numpy as np

    x = micro / 1e5  # values with a 5th decimal digit, crossing zero
    y = x * 10_000
    got_np = float(np.trunc(y + (0.5 if y >= 0 else -0.5)) / 10_000)
    got_py = math.trunc(y + (0.5 if y >= 0 else -0.5)) / 10_000
    want = duckdb.execute(
        "SELECT ROUND(CAST(? AS DOUBLE), 4)", [x]
    ).fetchone()[0]
    assert got_np == want and got_py == want


# -- log-histogram bucket law (operators/sketches.py::loghist_counts) -------
#
# Pure mirror of the exact integer bucket math both engines run; the
# Spark implementation is pinned against DuckDB by the oracle and
# against these bounds by test_sketches — this fuzzes the DESIGN: for
# every positive 2-dp value the bucket's [lb, ub) contains it and the
# relative width never exceeds 1/k.

K = 16


def _bucket(v: float):
    from decimal import Decimal, ROUND_HALF_UP

    w = int(Decimal(str(v)).quantize(Decimal("0.01"), ROUND_HALF_UP) * 100)
    if w < 1:
        return None
    e = w.bit_length() - 1
    sub = (w * K) // (1 << e) - K
    return e, sub


@settings(max_examples=500, deadline=None)
@given(st.floats(min_value=0.01, max_value=1e12, allow_nan=False,
                 allow_infinity=False))
def test_loghist_bucket_contains_value_within_relative_width(v):
    b = _bucket(v)
    if b is None:
        return
    e, sub = b
    assert 0 <= sub < K
    lb = (1 << e) * (K + sub) / K / 100
    ub = (1 << e) * (K + sub + 1) / K / 100
    from decimal import Decimal, ROUND_HALF_UP

    w = float(Decimal(str(v)).quantize(Decimal("0.01"), ROUND_HALF_UP))
    assert lb <= w < ub
    assert ub / lb <= 1 + 1.0 / K + 1e-12


@settings(max_examples=500, deadline=None)
@given(st.floats(min_value=0.01, max_value=1e12, allow_nan=False,
                 allow_infinity=False),
       st.floats(min_value=0.01, max_value=1e12, allow_nan=False,
                 allow_infinity=False))
def test_loghist_bucket_is_monotone(u, v):
    """Bucket order respects value order — the cumulative read-off
    depends on (e, sub) sorting exactly like the values they hold."""
    a, b = _bucket(min(u, v)), _bucket(max(u, v))
    if a is None or b is None:
        return
    assert a <= b
