"""Query registry: one named entry per operator from SURVEY.md §2.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) the ANSI-SQL string a DuckDB oracle runs on the same
parquet tables. Column names are part of the contract: every computed
column is aliased identically on both sides (the driver's compare sorts
columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a query under `name` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def set_priority(names: list[str]) -> None:
    """Reorder the registry so `names` come first (then registration order).

    The round driver writes CORRECTNESS rows for only the first ~50
    entries of `queries()`, in order. r01 cut alphabetical-module order
    after 50, leaving text_*/sim_*/stream_* and the second TPC-H batch
    with no official row; this hook puts a curated, family-complete
    window first. Unknown names are an error (catches typos when
    queries are renamed).
    """
    global _REGISTRY
    unknown = [n for n in names if n not in _REGISTRY]
    if unknown:
        raise KeyError(f"set_priority: unknown query names {unknown}")
    ordered = {n: _REGISTRY[n] for n in names}
    for n, q in _REGISTRY.items():
        ordered.setdefault(n, q)
    _REGISTRY = ordered


def get(name: str) -> Query:
    return _REGISTRY[name]


def all_queries() -> dict[str, Query]:
    return dict(_REGISTRY)


def all_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in _REGISTRY.values() if q.oracle is not None}
