"""Operator library.

Each module exposes two dicts keyed by query name:

- ``QUERIES``: name -> Callable[(SparkSession, sf_dir str), DataFrame]
- ``ORACLES``: name -> DuckDB ANSI-SQL string over the same parquet
  tables (absent for non-SQL-expressible operators; the driver then
  records a weaker rows-only check).

Column names are aliased identically on both sides — the driver's
comparator sorts columns by name before value-hashing.
"""
