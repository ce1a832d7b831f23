"""Array-expression utilities shared by the per-row text/dedup operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind_array(arr: Column, fn) -> Column:
    """Let-binding for Catalyst array expressions: evaluate ``arr`` ONCE
    per row and pass the RESULT to ``fn`` as a bound lambda variable.

    Catalyst higher-order lambdas substitute the producer's expression
    TREE, not its value — composing ``transform(idx, i -> f(slice(words,
    i, k)))`` where ``words`` is itself an expression (e.g. ``split``)
    re-evaluates the whole producer at EVERY element: O(n²) per row,
    invisible on short test rows and fatal on real documents (measured
    27.5s → 0.7s on winnow_fingerprints at sf0.1). Catalyst has no let
    construct; ``get(transform(array(arr), fn), 0)`` is one: the
    single-element wrapper array evaluates ``arr`` once, and the lambda
    variable is a value reference. Apply at every level whose output is
    referenced inside a downstream lambda."""
    return F.get(F.transform(F.array(arr), fn), 0)
