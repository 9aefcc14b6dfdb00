"""Privacy / anonymization functions for training-data pipelines.

The reference stores raw author ids and usernames verbatim
(sentiment_analysis.py:162-166); a pipeline producing shareable corpora
needs the standard de-identification toolkit. Pure Column algebra — both
ops run inside whole-stage codegen and have exact DuckDB twins.

- ``pseudonymize``: salted SHA-256 of the identifier — deterministic (the
  same subject maps to the same pseudonym across tables and runs, so joins
  still work) yet irreversible without the salt. Rotate the salt to break
  linkage between releases.
- k-anonymity audit (see ``queries/shaping.py::q_k_anonymity``): group
  sizes over a quasi-identifier tuple — the release gate that catches
  "this (type, hour, k-bucket) combination identifies one user".
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pseudonymize(col: Column, salt: str) -> Column:
    """Deterministic salted pseudonym: lowercase-hex SHA-256 of
    ``salt || str(value)``. NULL stays NULL (no phantom subjects)."""
    return F.when(
        col.isNotNull(),
        F.sha2(F.concat(F.lit(salt), col.cast("string")), 256))
