"""Expression-building helpers shared across operators."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(bound: Column, body: Callable[[Column], Column]) -> Column:
    """Bind ``bound`` to a lambda variable and evaluate ``body`` on it.

    Column expressions referenced inside higher-order-function lambdas
    are re-inlined (and higher-order functions run interpreted, without
    whole-stage codegen subexpression elimination), so an expression
    like ``transform(seq, i -> f(element_at(TOKS, i)))`` re-evaluates
    the whole TOKS subtree once per element per reference. Wrapping it
    as ``get(transform(array(TOKS), tk -> body(tk)), 0)`` evaluates
    TOKS exactly once per row — a let-binding. Measured ~10x on the
    shingling path (52 shingles x 3 element_at x retokenize).
    """
    return F.get(F.transform(F.array(bound), body), 0)
