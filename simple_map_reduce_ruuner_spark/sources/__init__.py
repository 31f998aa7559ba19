from simple_map_reduce_ruuner_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    register_temp_views,
)
from simple_map_reduce_ruuner_spark.sources.text import (
    read_text_chunked,
    write_text_single,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_temp_views",
    "read_text_chunked",
    "write_text_single",
]
