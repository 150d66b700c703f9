"""North-rule packaging evidence: the engine really runs under
``spark-submit --py-files sparkgrep.zip`` (BASELINE.json: "runs via
spark-submit --py-files on multi-executor clusters").

The test zips the package, then drives build + query through
``spark-submit`` from a clean working directory — the driver script
asserts that ``sparkgrep`` is imported FROM THE ZIP (not from a
checkout on sys.path), which is exactly the cluster deployment mode.

Reference analogue: the reference ships a pip-installed package driven
by console entry points (Instructions.md); a Spark engine's equivalent
distribution unit is the --py-files archive.
"""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile

import pytest

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"

DRIVER = """\
import sys
import sparkgrep
# the whole point: imports must resolve from the --py-files archive
assert "sparkgrep.zip" in sparkgrep.__file__, sparkgrep.__file__
from sparkgrep.cli import main
sys.exit(main(sys.argv[1:]))
"""


def _make_zip(dest_dir: str) -> str:
    zpath = os.path.join(dest_dir, "sparkgrep.zip")
    pkg = os.path.join(REPO, "sparkgrep")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(cwd: str, args: list[str]) -> str:
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.setdefault("SPARKGREP_LOCAL_DIR", os.path.join(cwd, "scratch"))
    # keep the submitted job small; get_spark also honors the
    # spark-submit --master via the JVM conf (session.py)
    env["SPARK_GRAFT_CPUS"] = "4"
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--py-files", "sparkgrep.zip",
        "submit_main.py", *args,
    ]
    r = subprocess.run(
        cmd, cwd=cwd, env=env, capture_output=True, text=True, timeout=600
    )
    assert r.returncode == 0, f"spark-submit failed:\n{r.stdout}\n{r.stderr[-4000:]}"
    return r.stdout


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_build_and_query_via_spark_submit(tmp_path):
    cwd = str(tmp_path)
    _make_zip(cwd)
    with open(os.path.join(cwd, "submit_main.py"), "w") as f:
        f.write(DRIVER)
    idx = os.path.join(cwd, "idx")

    out = _submit(
        cwd,
        ["build", "--input", SF, "--out", idx, "--buckets", "8"],
    )
    assert '"n_docs"' in out or "n_docs" in out  # build meta JSON printed

    out = _submit(
        cwd,
        ["query", "--index", idx, "--query", "hash join", "-k", "5",
         "--mode", "expr"],
    )
    lines = [ln for ln in out.splitlines() if "doc=" in ln]
    assert len(lines) == 5 and "score=" in lines[0]
