"""Portable vs engine-native hash addressing for the sketch/dedup family.

Every probabilistic operator in this repo (MinHash, CMS, Bloom, HLL,
hash-bucket sampling) addresses its buckets with the same portable recipe:
a 32-bit md5 prefix — ``conv(substring(md5(x), 1, 8), 16, 10)``.  md5 is
deliberate: the identical construction runs literal-for-literal in any
engine, which is what makes the DuckDB oracle able to reproduce sketch
state bit-for-bit (the correctness gate).

But md5 is a cryptographic digest routed through hex-string machinery —
at 100 TB the per-token hash is the dominant linear term of the sketch
builds (SCALE.md: ``cms_token_counts`` pays 4 md5s/token).  Spark ships a
native, whole-stage-codegen'd 64-bit xxHash (``xxhash64`` — the same
family its own shuffle/bloom internals use); this module makes the choice
a parameter:

- ``mode="md5"`` (DEFAULT everywhere): the portable oracle-parity recipe.
  All roster queries and all parity tests run in this mode, unchanged.
- ``mode="xxhash64"``: opt-in engine-matched fast path —
  ``xxhash64(x) & 4294967295`` for the same non-negative 32-bit domain.
  Same distribution quality, no hex/string work, stays inside codegen.
  NOT oracle-portable (DuckDB has no xxhash64 builtin with Spark's
  seeding), so it is a deployment knob, not a parity mode.  Measured
  deltas on the 10x scale twins are recorded in SCALE.md.

The two modes produce different (but equally uniform) bucket assignments;
results of sketch queries differ in the expected sketch-noise way, not in
contract (CMS upper bound, Bloom zero-false-negative, MinHash unbiasedness
hold under any uniform hash family).
"""

from __future__ import annotations

HASH_MODES = ("md5", "xxhash64")


def prefix_hash32(expr: str, mode: str = "md5") -> str:
    """SQL text: non-negative 32-bit hash of ``expr`` as BIGINT.

    md5: first 8 hex chars of the digest (the repo-wide portable recipe).
    xxhash64: Spark-native hash masked to the same [0, 2^32) domain.
    """
    if mode == "md5":
        return f"cast(conv(substring(md5({expr}), 1, 8), 16, 10) as bigint)"
    if mode == "xxhash64":
        return f"(xxhash64({expr}) & 4294967295)"
    raise ValueError(f"hash mode must be one of {HASH_MODES}, got {mode!r}")
