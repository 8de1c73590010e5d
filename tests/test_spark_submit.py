"""The north rule's deployment path: spark-submit --py-files on a
multi-executor cluster.  ``local-cluster[2,2,2048]`` starts two real
executor JVMs (separate worker processes; the library zip is shipped to
each) — the same code path a YARN/K8s cluster uses."""

import json
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"),
                            "bin", "spark-submit")


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this machine")
def test_submit_pipeline_on_local_cluster(tmp_path):
    zip_path = tmp_path / "kgloom.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "kgloom")):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    out = subprocess.run(
        [SPARK_SUBMIT, "--master", "local-cluster[2,2,2048]",
         "--conf", "spark.executor.memory=1g",
         "--py-files", str(zip_path),
         os.path.join(REPO, "scripts", "submit_pipeline.py"),
         "--turns", "20000", "--store", str(tmp_path / "store"),
         "--shuffle-partitions", "8"],
        capture_output=True, text=True, timeout=420,
        env={**os.environ, "PYSPARK_PYTHON": sys.executable})
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    metrics = json.loads(line)
    assert metrics["turns"] == 20000
    assert metrics["triples"] > 3 * 20000
    assert metrics["executors"] == "local-cluster[2,2,2048]"
