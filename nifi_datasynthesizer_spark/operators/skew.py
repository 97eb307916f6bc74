"""Skew mitigation utilities.

AQE's skew-join handling splits oversized sort-merge partitions at
runtime, but two shapes still need explicit help at 100 TB:

- joining a skewed fact key against a dimension too big to broadcast
  (``salted_join``): the hot key's rows all land on one reducer in a
  plain shuffle join no matter what AQE does to the other side;
- hot-key aggregation where the combiner can't shrink state (e.g.
  collect-style aggs) — the same salt-then-merge idea applies.

Salting is deterministic here (hash of a caller-named fact column,
never ``rand()``/``monotonically_increasing_id()``) so tasks stay
idempotent under speculative execution and retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(fact: DataFrame, dim: DataFrame, key: str, salt_col: str,
                salt: int = 8, how: str = "inner",
                force_shuffle: bool = False) -> DataFrame:
    """Skew-resistant equi-join: fact rows spread across ``salt``
    sub-keys by a deterministic hash of ``salt_col``; the dimension is
    replicated ``salt`` times (explode over the salt range) so every
    sub-key finds its match.  The join key becomes (key, __salt) —
    a hot fact key now occupies ``salt`` reducers instead of one.

    Cost model: dim shuffle volume × salt (use for dims that are too
    big to broadcast but far smaller than the fact side — the classic
    skewed-fact/medium-dim shape).  Result is exactly the plain join;
    the salt never reaches the output.

    ``force_shuffle`` pins a shuffle join (test/demo hook) — with a
    broadcastable dim Catalyst would otherwise broadcast, which already
    neutralizes skew.
    """
    f = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt)))
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    if force_shuffle:
        d = d.hint("shuffle_hash")
    return f.join(d, [key, "__salt"], how).drop("__salt")
