"""Source/sink layer: ORC-native tables with the reference's storage
knobs, plus footer-level metadata introspection (SURVEY.md §2.1, §7.2 M1).
"""

from pim_orc_spark.sources.orc_io import (
    REFERENCE_ORC_OPTIONS,
    orc_metadata,
    orc_table,
    read_orc,
    write_orc,
)

__all__ = [
    "REFERENCE_ORC_OPTIONS",
    "orc_metadata",
    "orc_table",
    "read_orc",
    "write_orc",
]
