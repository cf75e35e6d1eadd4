"""vald — a Ray-Data-native schema + constraint validation engine.

A brand-new distributed table validator that generalizes per-document
JSON-Schema ``validate(doc) -> result`` semantics (the capability set of
the reference ``ianalbert/JSONSchema``; reference checkout empty in this
sandbox — see SURVEY.md §0.1, semantics cited to the published draft-03
spec and BASELINE.json instead) to Parquet corpora on Ray Data:

- ``vald.jsonschema``  — draft-03 per-value validator (dynamic path)
- ``vald.kernels``     — vectorized pyarrow batch kernels (fast path)
- ``vald.ir``          — ConstraintSet IR + spec compiler
- ``vald.pipeline``    — read → stamp → row-checks → shuffles → verdicts
- ``vald.constraints_dist`` — uniqueness / referential / drift checks
- ``vald.sketches``    — HLL, t-digest, histogram (pure numpy)
- ``vald.aggregates``  — profile aggregation (exact + sketch modes)
- ``vald.checkpoint``  — per-partition manifest, resume, lineage
- ``vald.corpus``      — deterministic synthetic code-corpus generator

Library code never calls ``ray.init``/``ray.shutdown`` — the caller
(driver, bench.py, test fixture) owns the Ray session.
"""

__version__ = "0.1.0"
