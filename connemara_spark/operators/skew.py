"""Skew mitigation: explicit key salting for pathological hot keys.

AQE's skew-join handling (on in `session.get_spark`) splits oversized
shuffle partitions of a sort-merge join at runtime and is the right
default. Explicit salting still earns its keep when:

- the skewed side feeds a chain (join → groupBy on the same key) where a
  single hot key must stay split across BOTH stages,
- the small side is replicable but too big to broadcast, or
- a deterministic, planner-independent plan is required (benchmark
  comparisons, regression pinning).

``salted_join`` splits every big-side key across ``n_salts`` sub-keys and
replicates the small side once per salt: shuffle partitions shrink by
~n_salts for hot keys at the cost of an n_salts× blowup of the SMALL side
only. The salt comes from ``rand(seed)`` — per-row, no content
dependence; a task retry may re-salt a row differently, which is safe
here because every salt value carries a full copy of the small side (any
salt joins correctly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    *,
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``big ⋈ small`` with the shuffle key widened to
    (key…, salt) so one hot key spreads over ``n_salts`` partitions.

    Output columns: all of ``big``'s, plus ``small``'s non-key columns
    (same contract as ``big.join(small, on, how)``). Supported ``how``:
    inner / left (semantics that don't need small-side-unmatched rows —
    a right/full salted join would emit one row per salt replica).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    keys = [on] if isinstance(on, str) else list(on)
    salted_big = big.withColumn(
        "__salt", F.floor(F.rand(seed) * n_salts).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_big.join(salted_small, [*keys, "__salt"], how)
    return out.drop("__salt")
