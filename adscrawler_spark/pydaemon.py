"""Python worker daemon that preloads the heavy Arrow-UDF imports.

Every forked PySpark worker that runs a pandas UDF imports pandas +
pyarrow on first use (~0.35 s CPU at idle, several seconds under a
busy box).  With the stock ``pyspark.daemon`` each NEW worker process
pays that import; a stage fan-out that outruns the idle-worker pool
(concurrent jobs, the first Arrow stage of a session) forks a wave of
workers that all import simultaneously.  Preloading in the daemon
parent makes the modules part of the fork image, so workers inherit
them copy-on-write for free (guide §4: heavyweight init once — here
once per DAEMON, not even once per worker).

Wired via ``spark.python.daemon.module`` in ``session.get_spark``;
``adscrawler_spark`` must be importable by the worker python
(get_spark exports the repo root on PYTHONPATH before the JVM starts).
"""

import pandas  # noqa: F401
import pyarrow  # noqa: F401
import pyspark.sql.pandas.serializers  # noqa: F401  — Arrow stream chain

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
