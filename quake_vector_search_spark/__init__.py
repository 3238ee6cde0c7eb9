"""quake_vector_search_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``arijit1/quake-vector-search`` (adaptive IVF vector
search per the Quake paper, arXiv:2506.03437), extended with the
relational / text / dedup / time-series operators a large-scale
training-data pipeline needs.

Design principles (see SURVEY.md):
- DataFrame/SQL first: declare logical plans, let Catalyst pick physical
  strategies (pushdown, pruning, broadcast, AQE).
- Vectorized Python only where built-ins can't express the semantics:
  Arrow-backed pandas UDFs / mapInPandas with NumPy kernels.
- Deterministic: every stochastic step is seeded; every top-k output is
  tie-broken on (dist ASC, id ASC) so results hash-match a DuckDB oracle.
"""

__version__ = "0.1.0"

from quake_vector_search_spark.session import get_spark  # noqa: F401
