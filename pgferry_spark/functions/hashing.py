"""Portable hashing helpers.

Two families:

* **Engine-parity hashes** (FNV-1a re-exported from catalog.identifiers,
  SHA-256 fingerprints) used by DDL naming and checkpoint compatibility.
* **Oracle-portable content hashes** for the dedup/similarity operators:
  these are built on ``md5`` because both Spark SQL and DuckDB implement
  identical md5 hex output, which lets every MinHash/fingerprint operator be
  verified against an ANSI-SQL oracle bit-for-bit. At 100 TB you would swap
  ``md5`` for ``xxhash64`` (cheaper, JVM-intrinsic) via the ``hash_expr``
  hook — the operator shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..catalog.identifiers import fnv1a_32, fnv1a_64  # noqa: F401  (re-export)


def md5_token_hash(token: Column, seed: int) -> Column:
    """Seeded, oracle-portable token hash: md5('<seed>:' || token)."""
    return F.md5(F.concat(F.lit(f"{seed}:"), token))


def minhash_signature(tokens: Column, num_hashes: int) -> Column:
    """MinHash signature over a token-set column: for each seed i, the
    lexicographic min of md5('<i>:'||token). Returns array<string> of length
    ``num_hashes``.

    Lexicographic min over fixed-width hex digests is order-isomorphic to
    numeric min over the 128-bit hash values, so this is a faithful MinHash
    while staying portable to the SQL oracle.
    """
    def hasher(seed: int):
        # single-arg lambda: a two-arg lambda would receive (element, index)
        return lambda t: md5_token_hash(t, seed)

    sigs = [F.array_min(F.transform(tokens, hasher(s))) for s in range(num_hashes)]
    return F.array(*sigs)


def band_hashes(signature: Column, bands: int, rows_per_band: int) -> list[Column]:
    """LSH banding: hash each band (contiguous ``rows_per_band`` slice of the
    signature) to one bucket key. Docs sharing any band bucket are candidate
    near-duplicates."""
    out = []
    for b in range(bands):
        sl = F.slice(signature, b * rows_per_band + 1, rows_per_band)
        out.append(F.md5(F.concat_ws("|", sl)))
    return out
