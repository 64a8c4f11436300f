"""usc_ds_relationextraction_spark — a PySpark-native, from-scratch
knowledge-graph construction engine with the capabilities of
INK-USC/USC-DS-RelationExtraction (CoType, WWW'17).

Not a port: the reference is a Python-2 + C++ batch pipeline
(see /root/reference/run.sh); this engine re-expresses every capability —
mention detection, distant-supervision labeling, vectorized feature
extraction, bipartite-graph construction, joint embedding training
(BCD semantics), nearest-type inference, triple materialization — as
DataFrame transformations over parquet/Iceberg tables of multi-turn
transcripts ``(conv_id, turn_idx, role, text, tool, ts)``.

Design invariants (BASELINE.json north_rule):
 - DataFrame/SQL first; Python only via vectorized pandas/Arrow UDFs.
 - Explicit partitioning & skew handling (salted broadcast joins, AQE).
 - Every stage writes a table → checkpoint/resume + lineage.
 - Deterministic: seeded hash-derived randomness, no wall clock.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
