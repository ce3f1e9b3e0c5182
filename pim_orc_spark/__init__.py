"""pim_orc_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference system (UBC-ECE-Sasha/PIM-ORC, studied read-only at
/root/reference/): partitioned columnar ORC scans, projection, NULL-aware
filtering, and partial/final aggregation (reference: orc-parser/reader.cc),
generalized to the full relational surface Spark provides, plus
LLM-training-data pipeline operators (dedup, similarity search, text
analysis, multimodal columns) designed for 100 TB scale.

Design stance (SURVEY.md §7.0): declare logical plans with the
DataFrame/SQL API and let Catalyst + Tungsten pick physical strategy;
Pandas UDFs / applyInPandas only where built-ins cannot express the
semantics. Zero custom Catalyst rules are needed for reference parity.
"""

from pim_orc_spark.session import get_spark, ensure_parity_confs

__all__ = ["get_spark", "ensure_parity_confs"]
__version__ = "0.1.0"
