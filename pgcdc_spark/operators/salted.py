"""Salted join — the skew-mitigation helper from SURVEY.md §4.2.

When one join key carries a disproportionate share of rows (a "hot key"),
the shuffle hash-partitions every occurrence of that key into ONE reducer:
at 100 TB a single straggler task holds the whole stage. AQE's skew-join
splitting (on in session.py) handles sort-merge cases automatically;
this helper is the explicit form for when the skewed side must join a
mid-sized table that is too big to broadcast but small enough to
replicate ``n_salts``-fold:

- fact side: salt = hash of the WHOLE row mod ``n_salts`` — spreads each
  key over ``n_salts`` reducers because hot-key rows differ in payload.
  The salt must vary within a key (so it cannot come from the key alone)
  but must also be DETERMINISTIC: a nondeterministic salt (rand,
  monotonically_increasing_id) re-salts rows when a lost map task is
  recomputed after some reducers already fetched, silently dropping or
  duplicating join output. Fully identical duplicate rows share a salt —
  correct, just unspread (they are indistinguishable anyway);
- other side: explode over all ``n_salts`` salt values (size x n_salts);
- join on (key, salt) — per-reducer load drops ~n_salts-fold for the hot
  key at the cost of replicating the smaller side.

Result is row-identical to the unsalted join (verified by the driver
oracle via the ``join_salted_skew`` query in queries/joins.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Equi-join ``skewed`` with ``other`` on ``on``, spreading hot keys
    over ``n_salts`` shuffle partitions. Only inner/left joins are safe:
    for right/full the replicated side would duplicate unmatched rows."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salted = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*skewed.columns), F.lit(n_salts)).cast("int")
    )
    replicated = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(replicated, [*keys, "_salt"], how).drop("_salt")
