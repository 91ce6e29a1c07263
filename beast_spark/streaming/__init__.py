from beast_spark.streaming.ingest import ProtoIngest  # noqa: F401
from beast_spark.streaming.sink import WarehouseSink  # noqa: F401
