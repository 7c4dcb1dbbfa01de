"""spark-submit --py-files deployment test.

The north rule's deployment clause: the engine runs "via spark-submit
--py-files on a multi-executor cluster".  This drives the REAL submission
path end-to-end — build the archive, spark-submit the job entrypoint with
the package importable ONLY from the zip (cwd moved elsewhere), read the
metrics line and the written pyramid back.
"""
import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this host")
def test_submit_job_with_pyfiles(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import make_pyfiles
        zip_path = make_pyfiles.build(str(tmp_path / "geomesa_spark.zip"))
        # determinism: same tree -> byte-identical archive
        zip2 = make_pyfiles.build(str(tmp_path / "again.zip"))
        assert open(zip_path, "rb").read() == open(zip2, "rb").read()
    finally:
        sys.path.pop(0)

    out_dir = str(tmp_path / "tiles")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         os.path.join(REPO, "scripts", "submit_job.py"),
         "--synthesize", "20000", "--output", out_dir, "--zooms", "0", "4"],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path),  # NOT the repo: the package must load from the zip
        env=env)
    assert proc.returncode == 0, proc.stderr[-4000:]
    metrics = json.loads([ln for ln in proc.stdout.splitlines()
                          if ln.startswith("{")][-1])
    assert metrics["pyramid_pixels"] > 0
    assert sorted(os.listdir(out_dir))  # partitioned parquet written
    assert any(d.startswith("zoom=") for d in os.listdir(out_dir))
