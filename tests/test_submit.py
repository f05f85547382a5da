"""spark-submit --py-files launch evidence (the north-rule deploy mode).

Packages wikiprep_spark into a zip, copies the job script into a scratch
directory (so the repo root is NOT on the driver's module path), and
launches it with the real ``spark-submit`` binary — the package must
resolve from the ``--py-files`` archive alone, exactly as on a cluster.
"""

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_bin():
    try:
        import pyspark
    except ImportError:
        return None
    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin",
                        "spark-submit")
    if os.path.exists(cand):
        return cand
    return shutil.which("spark-submit")


def build_pkg_zip(dest: str) -> str:
    """Package the engine the way a deploy pipeline would:
    wikiprep_spark/**/*.py (+ data files) into one archive."""
    pkg_root = os.path.join(REPO, "wikiprep_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for base, _, files in os.walk(pkg_root):
            for fn in files:
                if fn.endswith((".py", ".json")):
                    full = os.path.join(base, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    return dest


@pytest.mark.skipif(_spark_submit_bin() is None,
                    reason="spark-submit binary not found")
def test_spark_submit_py_files(tmp_path):
    pkg = build_pkg_zip(str(tmp_path / "wikiprep_spark.zip"))
    job = str(tmp_path / "job.py")
    shutil.copy(os.path.join(REPO, "tools_submit_job.py"), job)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    out = subprocess.run(
        [_spark_submit_bin(),
         "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--py-files", pkg,
         job, "/root/testdata/sf0.001"],
        capture_output=True, text=True, timeout=600,
        cwd=str(tmp_path), env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    triples = [ln for ln in out.stdout.splitlines()
               if ln.startswith("TRIPLES ")]
    assert triples, out.stdout[-2000:]
    assert int(triples[0].split()[1]) > 0
