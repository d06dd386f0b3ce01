"""insar_spark — a PySpark-native time-series rollup / downsample / retention engine.

A from-scratch engine (NOT a port) that reinterprets the operator semantics of
the reference InSAR time-series package (scottstanie/insar, read-only at
/root/reference) over a table of multi-turn conversation transcripts:

    (conv_id string, turn_idx int, role string, text string, tool string, ts timestamp)

Mapping (see SURVEY.md for the full table):

* pixel (row, col)            -> (conv_id, metric) — one independent series
* SLC date list               -> ordered turn timestamps within a conversation
* interferogram (date pair)   -> pairwise delta between two turns
* SBAS inversion  A phi = dphi -> per-conversation reconstruction of a
                                  cumulative series from pairwise deltas
* reference-point shift       -> per-series alignment (subtract first value)
* lowess / stack average      -> rollups at 1m/1h/1d retention tiers

Everything is the DataFrame/SQL API; Python only enters through vectorized
Arrow `applyInPandas` / `pandas_udf` kernels (never per-row Python UDFs).
"""

__version__ = "0.1.0"

from insar_spark.session import get_spark  # noqa: F401
