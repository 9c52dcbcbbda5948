"""Per-process scratch root for query sinks, landing dirs and checkpoints.

Every path under the root is namespaced by the OWNING PROCESS (pid): two
concurrent sessions on the same scale factor previously shared fixed
global-tmp paths keyed only by the sf-dir basename, so one session's
rmtree/overwrite could destroy the other's output mid-query (ADVICE r4).
Tests that resolve a query's sink (bloom footer check, incremental-shard
file-identity check) run in the same process as the query and therefore
resolve the same namespaced path.

A pid namespace (not spark.app.id) is deliberate: scratch helpers are
called before any SparkSession exists (module import time for a few
constants), and within one process all sessions share the scratch tree
exactly as they share the driver JVM.
"""

from __future__ import annotations

import os
import tempfile


def scratch_root() -> str:
    root = os.path.join(
        tempfile.gettempdir(), "s4_spark_scratch", f"pid-{os.getpid()}"
    )
    os.makedirs(root, exist_ok=True)
    return root
