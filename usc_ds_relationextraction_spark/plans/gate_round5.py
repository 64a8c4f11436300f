"""Round-5 driver-gate (oracle-checked) entries.

S4 was the last pytest-only operator after round 4 closed the rest of
the sweep: the edge-list writer (reference ``pruning_heuristics.py:
65-71,96-101`` dumps the mention_feature / mention_type / feature_type
COO lists).  The gate here follows the S7/S8 round-trip pattern
(``gate_round4.py:179-259``): build the REAL COO graphs with the REAL
constructors (``operators/graphs.py``), write the feature_type edge
list — the one the reference's heuristics stage materializes — through
the REAL ``Warehouse.write`` (lineage metrics row included), read it
back, and emit integer-quantized weights.  The DuckDB oracle re-derives
the same edge list directly from the fixture chain, so hash agreement
proves the write→read cycle is the identity over a real graph table.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import h64_duckdb
from .gate_round4 import _wh


def s4_edge_list_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """S4: edge-list writer round-trip — the real mention_feature /
    mention_type / feature_type COO build (``operators/graphs.py:
    35-80``, reference pruning_heuristics.py:65-71,96-101) over the real
    EM feature strings and alias-linked types, written via
    ``Warehouse.write`` and read back; weights quantized ×1000."""
    from ..operators.graphs import (feature_type_graph,
                                    mention_feature_graph,
                                    mention_type_graph)
    from .parity_queries import _em_feature_rows, _entry
    e = _entry()
    key = F.concat_ws("_", "conv_id", "turn_idx", "start", "end")
    mf_rows = _em_feature_rows(spark, sf).select(
        key.alias("mention_key"), "feature")
    mt_rows = (e._linked_df(spark, sf)
               .select(key.alias("mention_key"),
                       F.col("entity_type").alias("label"))
               .groupBy("mention_key")
               .agg(F.sort_array(F.collect_set("label")).alias("labels")))
    fy = feature_type_graph(mention_feature_graph(mf_rows),
                            mention_type_graph(mt_rows))
    wh = _wh(spark, sf, "s4_roundtrip")
    back = wh.write("s4_feature_type", fy)
    return back.select(
        "feature_id", "type_id",
        F.floor(F.col("w") * 1000.0 + 0.5).cast("bigint").alias("w_milli"))


def _s4_sql(e) -> str:
    from .parity_queries import _feature_strings_sql
    fkey = "conv_id || '_' || turn_idx || '_' || start || '_' || \"end\""
    mkey = ("m.conv_id || '_' || m.turn_idx || '_' || m.start"
            " || '_' || m.\"end\"")
    return _feature_strings_sql(e) + f""",
s4_mf AS (
  SELECT DISTINCT {h64_duckdb(fkey)} AS mention_id,
         {h64_duckdb('feature')} AS feature_id
  FROM feats
),
s4_mt AS (
  SELECT DISTINCT {h64_duckdb(mkey)} AS mention_id,
         {h64_duckdb('a.entity_type')} AS type_id
  FROM mentions m JOIN {e._fx_sql('kb_aliases')} a ON m.surface = a.alias
)
SELECT f.feature_id, t.type_id,
       CAST(COUNT(*) * 1000 AS BIGINT) AS w_milli
FROM s4_mf f JOIN s4_mt t USING (mention_id)
GROUP BY f.feature_id, t.type_id
"""


# ------------------------------------------------------------- registry
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "s4_edge_list_roundtrip": s4_edge_list_roundtrip,
    }


def oracles() -> dict[str, str]:
    import __spark_entry__ as e
    return {
        "s4_edge_list_roundtrip": _s4_sql(e),
    }
