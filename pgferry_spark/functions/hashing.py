"""Portable hashing helpers.

* **Engine-parity hashes**: FNV-1a (re-exported from catalog.identifiers)
  for DDL naming; SHA-256 checkpoint fingerprints live in plans.checkpoint.
* **MinHash**: implemented in ``operators.dedup._minhash_agg`` as
  Kirsch–Mitzenmacher double hashing over ONE md5 per shingle — md5 because
  both Spark SQL and DuckDB produce identical digests, which keeps every
  dedup operator verifiable against the ANSI-SQL oracle bit-for-bit. Swap
  the base digest for ``xxhash64`` in production (JVM intrinsic); the
  operator shape is unchanged.
"""

from __future__ import annotations

from ..catalog.identifiers import fnv1a_32, fnv1a_64  # noqa: F401  (re-export)
