"""Custom sources (Spark 4 Python DataSource API).

The reference ingests from unix domain sockets
(/root/reference/input/unix.go); its Spark-native analog is a registered
Python data source — ``spark.dataSource.register(UnixLineDataSource)`` —
usable from both ``spark.read`` and ``spark.readStream``.
"""

from s4_spark.sources.chunk_spool import ChunkSpoolDataSource  # noqa: F401
from s4_spark.sources.linespool import LineSpoolDataSource  # noqa: F401
from s4_spark.sources.unix_socket import UnixLineDataSource  # noqa: F401


def register(spark) -> None:
    """Register the custom sources/sinks with a session. The modules are
    marked pickle-by-value first: Spark ships DataSource classes to
    executor python workers by pickle, and those workers don't
    necessarily have this package on sys.path (the driver may have
    imported it from an arbitrary directory)."""
    from pyspark import cloudpickle

    from s4_spark.sources import chunk_spool as _chunks
    from s4_spark.sources import linespool as _spool
    from s4_spark.sources import unix_socket as _mod

    cloudpickle.register_pickle_by_value(_mod)
    cloudpickle.register_pickle_by_value(_spool)
    cloudpickle.register_pickle_by_value(_chunks)
    spark.dataSource.register(UnixLineDataSource)
    spark.dataSource.register(LineSpoolDataSource)
    spark.dataSource.register(ChunkSpoolDataSource)
