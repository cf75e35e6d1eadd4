"""Driver-harness query catalog (SURVEY.md 2.C) — package facade.

Each query has a Ray-Data-first implementation and a DuckDB oracle in
ORACLE_SQL. Contract (driver __ray_entry__): callable(sf_dir) ->
Dataset / pandas / Arrow; column NAMES must match the oracle's aliases
exactly (the driver sorts columns by name and hashes values). Floating
aggregates are rounded to 6 dp on BOTH sides.

Split into submodules round 4: checks / relational / temporal / llmops
(+ _shared helpers, registry). Public surface is unchanged: QUERIES,
ORACLE_SQL, and every q_* symbol re-exported here.
"""

from __future__ import annotations

from ._shared import _empty, _ensure_schema, _mkt_keys_ds, _read  # noqa: F401
from .checks import *  # noqa: F401,F403
from .llmops import *  # noqa: F401,F403
from .relational import *  # noqa: F401,F403
from .temporal import *  # noqa: F401,F403
from .registry import ORACLE_SQL, QUERIES  # noqa: F401

__all__ = ["QUERIES", "ORACLE_SQL"]
