"""Skew-handling operators: salted two-stage aggregation and salted joins.

At 100 TB a handful of hot keys (a viral document, a default customer id,
a 5-value event_type column) turns one shuffle partition into the job's
critical path.  AQE's skew-join splitting handles *storage* skew in sort-
merge joins, but two shapes still need explicit salting:

- **hot-key aggregation**: ``groupBy(k)`` with few distinct ``k`` leaves
  most reducers idle and the hot ones overloaded.  Salting splits each key
  into ``n_salts`` sub-groups aggregated in parallel, then combines the
  (tiny) partials in a second stage.
- **hot-key join**: a fact table joining a *non-broadcastable* dimension on
  a skewed key.  The dimension is replicated once per salt so each fact
  row can pick any salt and still find its match; the fact side spreads
  uniformly across ``key × n_salts`` partitions.

Both preserve exact semantics — results are identical to the unsalted
plan, which is what the oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: measure -> (partial aggregate, final combiner) — self-decomposable aggs.
_COMBINERS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation over skewed/low-cardinality keys.

    ``measures`` maps output name -> (combiner, input column) where
    combiner is one of ``sum | count | min | max`` (the self-decomposable
    aggregates; avg = sum/count composed by the caller).  Stage 1 groups by
    (keys + salt) so hot keys split across ``n_salts`` reducers; stage 2
    combines ``|keys| × n_salts`` partial rows — negligible.

    The salt is ``pmod(hash(monotonically_increasing_id()), n)`` — cheap,
    uniform, and content-independent; which salt a row lands on never
    affects the result.
    """
    for name, (combiner, _) in measures.items():
        if combiner not in _COMBINERS:
            raise ValueError(
                f"measure {name!r}: combiner {combiner!r} not in {sorted(_COMBINERS)}"
            )
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(
        *[
            _COMBINERS[combiner][0](col).alias(f"__p_{name}")
            for name, (combiner, col) in measures.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _COMBINERS[combiner][1](F.col(f"__p_{name}")).alias(name)
            for name, (combiner, _) in measures.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a fact table to a skew-hot, non-broadcastable dimension.

    The dimension is replicated ``n_salts`` times (explode over the salt
    range — acceptable because the dimension is the *small* side, just not
    broadcast-small); each fact row draws one salt, so a hot join key
    spreads over ``n_salts`` shuffle partitions instead of one.  Join
    output is exactly the unsalted join's.
    """
    if isinstance(on, str):
        on = [on]
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    dim_salted = dim.withColumn("__salt", salts)
    fact_salted = fact.withColumn(
        "__salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    return fact_salted.join(dim_salted, on + ["__salt"], how).drop("__salt")
