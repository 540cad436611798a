"""Source / sink layer: readers, writers, and the test-fixture catalog.

Reference parity: DataFrameReader / DataFrameWriter
(/root/reference sql/core/src/main/scala/org/apache/spark/sql/DataFrameReader.scala:54,
DataFrameWriter.scala:52) and the datasources package
(sql/core/.../execution/datasources/).
"""

from big_data_project_implementation_spark.sources.catalog import (
    TABLES,
    load_table,
    load_tables,
    register_views,
)
from big_data_project_implementation_spark.sources.readers import (
    read,
    read_jdbc,
    write_jdbc,
)
from big_data_project_implementation_spark.sources.writers import (
    write,
    write_bucketed_table,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read",
    "read_jdbc",
    "write_jdbc",
    "write",
    "write_bucketed_table",
]
