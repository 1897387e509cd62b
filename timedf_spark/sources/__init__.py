from timedf_spark.sources.readers import (
    fan_out,
    load_table,
    load_tables,
    read_csv,
    trigger,
    union_ingest,
)

__all__ = ["fan_out", "load_table", "load_tables", "read_csv", "trigger", "union_ingest"]
