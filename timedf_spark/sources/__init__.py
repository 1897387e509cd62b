from timedf_spark.sources.readers import (
    load_table,
    load_tables,
    read_csv,
    trigger,
    union_ingest,
)

__all__ = ["load_table", "load_tables", "read_csv", "trigger", "union_ingest"]
