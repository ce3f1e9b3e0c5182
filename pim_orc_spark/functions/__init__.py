"""Scalar/array function kernels shared by operators.

Each module exposes a Spark Column-expression builder AND (where the
operator is oracle-checked) the equivalent DuckDB SQL fragment generator,
so the engine and the differential-test oracle compute bit-identical
values (SURVEY.md §5: Spark-vs-DuckDB differential testing mirrors the
reference's CPU-vs-PIM dual-backend oracle, README.md:5-7).
"""
