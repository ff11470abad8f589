"""Expression utilities.

``let`` — single-evaluation binding for expensive column expressions.

Catalyst's CollapseProject re-inlines projected expressions into every
consumer, so an expression referenced N times is *evaluated* N times
(there is no common-subexpression elimination across array higher-order
function boundaries). For an expensive expression like a 16-hash MinHash
signature consumed by 4 band hashes, that inlining turns O(k) work into
O(k²)–O(k·bands·rows).

The classic fix is a let-binding, which Spark SQL lacks; we emulate it
with a one-element array ``transform``: the bound expression is evaluated
exactly once (to build the array), and the body references it through the
lambda variable, which can never be re-inlined.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(bound: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``bound`` once; feed it to ``body`` via a lambda variable."""
    return F.element_at(F.transform(F.array(bound), body), 1)


def let2(
    bound_a: Column, bound_b: Column, body: Callable[[Column, Column], Column]
) -> Column:
    """Two-variable let."""
    return let(bound_a, lambda a: let(bound_b, lambda b: body(a, b)))
