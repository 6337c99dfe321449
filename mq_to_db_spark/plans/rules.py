"""Recording rules: a named DAG of derived tables evaluated in
dependency order — the Prometheus-server feature (rule groups in
prometheus.yml; prometheus/rules/group.go evaluates each group's rules
sequentially so later rules see earlier results) that turns ad-hoc
query expressions into materializable, reusable series.

The reference externalizes this: its consumers write rows and leave
every derived metric to Prometheus recording rules + Grafana.  Here the
same concept is engine-native: a rule is ``name -> builder(env)`` where
``env`` maps already-evaluated rule names (plus the caller's base
tables) to DataFrames.  Evaluation is a Kahn topological sort over the
DECLARED dependencies, so rule files can be written in any order, cycles
fail loudly, and a rule can consume any mix of base tables and earlier
rules.

Spark-first semantics — the part that differs from Prometheus:

  * **Lazy by default.** A rule's DataFrame is a logical plan, not a
    materialization; chaining rules hands Catalyst ONE fused tree, so
    filters/projections written in a downstream rule push down through
    upstream rules for free (Prometheus evaluates each rule eagerly
    against the TSDB every interval — Spark doesn't need to).
  * **Shared nodes persist once.** A rule consumed by ≥2 downstream
    rules would be recomputed once per consumer in a lazy tree; with
    ``persist_shared=True`` (default) exactly those fan-out nodes get
    ``persist()`` — the cascade-partial reuse rule from
    plans/pipeline.py applied to the rule DAG.  Callers materializing
    rules into tier tables (TableIO) should pass False and manage
    storage themselves.

Scale: the evaluator itself is driver-side metadata (dict + list ops on
rule NAMES); everything heavy stays inside the DataFrames.  A rule
group with hundreds of rules costs the driver microseconds.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Mapping

from pyspark.sql import DataFrame

__all__ = ["Rule", "evaluate_rules"]


@dataclass(frozen=True)
class Rule:
    """One recording rule: ``expr(env)`` may read any base table or any
    rule named in ``deps`` from ``env``.  ``deps`` lists RULE names only
    (base tables are always visible); undeclared rule reads raise at
    evaluation time because the name is simply absent from ``env``."""

    name: str
    expr: Callable[[Mapping[str, DataFrame]], DataFrame]
    deps: tuple[str, ...] = field(default_factory=tuple)


def evaluate_rules(
    base: Mapping[str, DataFrame],
    rules: list[Rule],
    persist_shared: bool = True,
) -> dict[str, DataFrame]:
    """Evaluate ``rules`` in dependency order over ``base`` tables.

    Returns ``{rule.name: DataFrame}`` for every rule.  Raises
    ``ValueError`` on duplicate rule names, a dep naming a missing rule
    (or shadowing a base table), or a dependency cycle (named in the
    error).  With ``persist_shared``, rules consumed by more than one
    downstream rule are ``persist()``-ed at evaluation time.
    """
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        dupes = sorted({n for n in names if names.count(n) > 1})
        raise ValueError(f"duplicate rule names: {dupes}")
    shadowed = sorted(set(names) & set(base))
    if shadowed:
        raise ValueError(f"rules shadow base tables: {shadowed}")
    by_name = {r.name: r for r in rules}
    for r in rules:
        missing = [d for d in r.deps if d not in by_name]
        if missing:
            raise ValueError(
                f"rule {r.name!r} depends on unknown rule(s) {missing} "
                "(base tables need no declaration)"
            )

    # Kahn: indegree = number of declared rule-deps
    indeg = {r.name: len(set(r.deps)) for r in rules}
    consumers: dict[str, list[str]] = {n: [] for n in names}
    fanout: dict[str, int] = {n: 0 for n in names}
    for r in rules:
        for d in set(r.deps):
            consumers[d].append(r.name)
            fanout[d] += 1
    ready = sorted(n for n, k in indeg.items() if k == 0)
    order: list[str] = []
    while ready:
        n = ready.pop(0)
        order.append(n)
        for c in consumers[n]:
            indeg[c] -= 1
            if indeg[c] == 0:
                # sorted insertion keeps evaluation order deterministic
                import bisect

                bisect.insort(ready, c)
    if len(order) != len(rules):
        cyclic = sorted(n for n, k in indeg.items() if k > 0)
        raise ValueError(f"dependency cycle among rules: {cyclic}")

    env: dict[str, DataFrame] = dict(base)
    out: dict[str, DataFrame] = {}
    for n in order:
        df = by_name[n].expr(env)
        if not isinstance(df, DataFrame):
            raise TypeError(f"rule {n!r} returned {type(df).__name__}, not DataFrame")
        if persist_shared and fanout[n] >= 2:
            df = df.persist()
        env[n] = out[n] = df
    return out
