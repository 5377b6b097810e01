"""North-rule run mode: the engine must run via ``spark-submit --py-files``
(the whole package shipped as a zip, driver script importing it from the
archive, no repo on the executors' sys.path)."""

import os
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import sys
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.appName("submit-smoke")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
# the package must resolve from the --py-files archive, not the repo cwd
import od_database_spark
assert "oddb_pkg.zip" in od_database_spark.__file__, od_database_spark.__file__
from od_database_spark.functions.urls import with_canonical
from od_database_spark.operators import seen as seen_ops
cand = with_canonical(spark.createDataFrame(
    [(f"http://H{i}.Example.com:80/dir/#f",) for i in range(50)], "url string"))
seen = with_canonical(spark.createDataFrame(
    [(f"http://h{i}.example.com/dir/",) for i in range(30)], "url string")
).select(F.col("canon_url").alias("url"), "url_hash")
out = seen_ops.filter_unseen(cand, seen)
n = out.count()
assert n == 20, n
# pandas-UDF path exercised too (canonicalization ran through Arrow above)
print("SUBMIT_SMOKE_OK", n)
spark.stop()
"""


def test_spark_submit_py_files_smoke():
    # derive from the pyspark package itself — os.__file__ points at the
    # BASE interpreter's stdlib under a venv, and Debian uses dist-packages
    import pyspark

    submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if not os.path.exists(submit):
        pytest.skip("spark-submit not found")
    with tempfile.TemporaryDirectory(prefix="oddb_submit_") as d:
        pkg = os.path.join(d, "oddb_pkg.zip")
        subprocess.run(
            [sys.executable, os.path.join(REPO, "make_pyfiles.py"), pkg],
            check=True, capture_output=True,
        )
        driver = os.path.join(d, "driver.py")
        with open(driver, "w") as f:
            f.write(DRIVER)
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # nothing from the repo may leak in
        # pin the workers/driver to THIS interpreter — otherwise spark-submit
        # resolves whatever python3 is first on PATH (which may lack pyspark)
        env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
        out = subprocess.run(
            [submit, "--master", "local[4]", "--py-files", pkg, driver],
            capture_output=True, text=True, env=env, timeout=300, cwd=d,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        assert "SUBMIT_SMOKE_OK 20" in out.stdout, out.stdout[-500:]
