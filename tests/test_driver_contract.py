"""Guard the self-containment contract of __spark_entry__.

The driver harness builds a PLAIN SparkSession (no PYTHONPATH export, no
tuned confs, whatever OS timezone) and imports __spark_entry__ directly.
Round-1 failure mode: pandas-UDF closures referencing `dedup.*` modules are
cloudpickled by reference, so Python workers crashed with
ModuleNotFoundError unless the repo's own build_session had exported
PYTHONPATH first. This test reproduces the driver environment in a clean
subprocess (PYTHONPATH stripped) and runs every previously-failing channel
plus a timezone-sensitive query under a stock session.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
import __spark_entry__ as e

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.ui.enabled", "false")
    # driver sessions are stock: deliberately NO timezone / Arrow / AQE confs
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
q = e.queries()
SF = "/root/testdata/sf0.001"
# the four round-1 worker-import failures + one TZ-sensitive window query
for name in ["minhash_lsh_candidates", "simhash_candidates",
             "neardup_clusters_documents", "media_extract_features",
             "sessionize_events"]:
    n = q[name](spark, SF).count()
    assert n >= 0, name
    print("OK", name, n)
df = e.entry(spark)
assert df.count() > 0
print("OK entry")
spark.stop()
"""


def test_queries_run_under_stock_session_clean_env():
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=str(REPO))],
        env=env,
        cwd="/tmp",  # not the repo: imports must come from sys.path insert
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"stdout:\n{proc.stdout[-4000:]}\n\nstderr:\n{proc.stderr[-4000:]}"
    )
    assert "OK entry" in proc.stdout
