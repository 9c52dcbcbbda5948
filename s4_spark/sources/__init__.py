"""Custom sources (Spark 4 Python DataSource API).

The reference ingests from unix domain sockets
(/root/reference/input/unix.go); its Spark-native analog is a registered
Python data source — ``spark.dataSource.register(UnixLineDataSource)`` —
usable from both ``spark.read`` and ``spark.readStream``.
"""

from s4_spark.sources.unix_socket import UnixLineDataSource  # noqa: F401


def register(spark) -> None:
    """Register the custom sources with a session. The source module is
    marked pickle-by-value first: Spark ships DataSource classes to
    executor python workers by pickle, and those workers don't
    necessarily have this package on sys.path (the driver may have
    imported it from an arbitrary directory)."""
    from pyspark import cloudpickle

    from s4_spark.sources import unix_socket as _mod

    cloudpickle.register_pickle_by_value(_mod)
    spark.dataSource.register(UnixLineDataSource)
