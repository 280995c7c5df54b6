"""The engine's cross-engine uniform hash draw, in one place.

Every deterministic sampling / bucketing operator derives its
randomness from the first 8 hex chars of an md5 over a salted key —
a pure function of content that any engine reproduces exactly
(DuckDB twin: ``CAST(('0x' || substr(md5(..), 1, 8)) AS BIGINT)``),
unlike ``rand(seed)`` which seeds per partition and shifts with the
cluster layout. Callers build their own salted input string
(``concat_ws``) — the salt format is part of each operator's frozen
oracle contract, so it stays at the call site.

The older inlined copies (corpus.py::stratified_sample,
dedup.py's signature hashes) predate this module and back
frozen-window oracles; they intentionally stay inlined — consolidate
only if their oracles are ever regenerated.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_prefix_u32(col: Column) -> Column:
    """Uniform integer on [0, 2^32): first 8 md5 hex chars of ``col``
    as a bigint."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")
