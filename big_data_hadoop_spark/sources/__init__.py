"""Sources and sinks."""

from big_data_hadoop_spark.sources.io import (
    TABLES,
    load_table,
    load_tables,
    read_text_lines,
    write_partitioned_by_category,
    write_single_text_file,
    write_tsv,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_text_lines",
    "write_partitioned_by_category",
    "write_single_text_file",
    "write_tsv",
]
