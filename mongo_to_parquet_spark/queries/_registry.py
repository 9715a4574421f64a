"""Shared per-module query-registry factory.

Every family module in this package builds its ``QUERIES`` / ``ORACLE``
dicts through :func:`make_registry` so the duplicate-key guard lives in
ONE place. The guard raises ``ValueError`` (never ``assert``): a repeated
key would silently SHADOW the earlier query while its oracle kept gating
the new one (the round-7 near-miss), and a bare assert is stripped under
``python -O`` — exactly when the guard must still fire.
"""

from __future__ import annotations

from collections.abc import Callable


def make_registry() -> tuple[dict, dict, Callable]:
    """Return ``(QUERIES, ORACLE, q)`` for one family module.

    ``q(key, sql=None)`` registers the decorated callable under ``key``
    and, when ``sql`` is given, the DuckDB oracle string alongside it.
    """
    queries: dict = {}
    oracle: dict = {}

    def q(key: str, sql: str | None = None):
        def deco(fn):
            if key in queries:
                raise ValueError(f"duplicate query key: {key}")
            queries[key] = fn
            if sql is not None:
                oracle[key] = sql
            return fn

        return deco

    return queries, oracle, q
