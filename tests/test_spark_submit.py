"""Deployment-shape smoke test: the north rule says the job runs "via
spark-submit --py-files on a multi-executor cluster".  A real cluster is
out of reach in this sandbox, but the DEPLOYMENT SHAPE is fully testable
locally: package ``scrapy_processors_spark`` into a zip, copy the
entrypoint script to a temp directory OUTSIDE the repo (so its
parent-of-parent ``sys.path`` insert points at the temp dir, not the
repo), and spark-submit it with ``--py-files <zip>`` — every package
import must then resolve from the shipped zip exactly as it would on
executors of a real cluster.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="spark-submit not on this host")
def test_spark_submit_py_files_crawl(tmp_path):
    zip_path = str(tmp_path / "sps.zip")
    pkg_root = os.path.join(REPO, "scrapy_processors_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, REPO))

    # the script must NOT be able to import the package from its own
    # location — copy it out of the repo so only --py-files can satisfy
    # the imports (the real-cluster failure mode this test guards)
    script = str(tmp_path / "run_crawl.py")
    shutil.copyfile(os.path.join(REPO, "scripts", "run_crawl.py"), script)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path,
         script, "--seeds", "2000", "--hosts", "200", "--rounds", "2",
         "--buckets", "8"],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    assert out["rounds"] == 2
    assert out["urls_fetched"] > 0
    assert out["urls_seen"] >= out["urls_fetched"]
