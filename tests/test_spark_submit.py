"""spark-submit --py-files deployment evidence (north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Builds jsi_spark.zip exactly as a cluster deploy would, then launches a
REAL `spark-submit --py-files jsi_spark.zip runner.py validate ...`
subprocess whose driver imports jsi_spark ONLY from the shipped zip
(cwd is a scratch dir, PYTHONPATH scrubbed, repo root absent from
sys.path) — so a module missing from the zip, or an import-time
dependency on repo-relative files, fails here and nowhere later.

Asserts the CLI's full validation pass over a small interleaved corpus:
result JSON with all 32 partition buckets committed, the four output
tables (violations/verdicts/metrics/lineage) present with rows, and a
SECOND run over the same --out resuming to a no-op (all buckets already
committed in the checkpoint manifest).
"""

from __future__ import annotations

import json
import os
import subprocess
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """\
import sys
mods = [m for m in sys.modules if m.startswith("jsi_spark")]
assert not mods, f"jsi_spark preloaded: {mods}"
import jsi_spark
assert "jsi_spark.zip" in jsi_spark.__file__, (
    "driver must import jsi_spark from the --py-files zip, got "
    + jsi_spark.__file__)
from jsi_spark.cli import main
sys.exit(main(sys.argv[1:]))
"""


def _build_zip(path: str) -> None:
    pkg = os.path.join(REPO, "jsi_spark")
    with zipfile.ZipFile(path, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith((".py", ".json", ".md")):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))


def _submit(workdir: str, zip_path: str, runner: str, *args: str):
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "SPARK_GRAFT_CPUS")}
    env["SPARK_MASTER"] = "local[4]"
    env["PYTHONDONTWRITEBYTECODE"] = "1"
    out = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path, runner, *args],
        capture_output=True, text=True, timeout=600, cwd=workdir, env=env)
    assert out.returncode == 0, out.stderr[-4000:]
    payload = [ln for ln in out.stdout.splitlines()
               if ln.startswith("{")]
    assert payload, out.stdout[-2000:] + out.stderr[-2000:]
    return json.loads(payload[-1])


def test_spark_submit_py_files_validate_and_resume(spark, tmp_path):
    docs_path = str(tmp_path / "docs.parquet")
    out_dir = str(tmp_path / "validation_out")
    # corpus written by the test session; the submitted driver only READS
    from jsi_spark.datagen import gen_docs
    gen_docs(spark, 2000, n_media=100, partitions=8) \
        .write.parquet(docs_path)

    zip_path = str(tmp_path / "jsi_spark.zip")
    _build_zip(zip_path)
    runner = str(tmp_path / "runner.py")
    with open(runner, "w") as f:
        f.write(RUNNER)

    res = _submit(str(tmp_path), zip_path, runner,
                  "validate", "--docs", docs_path, "--out", out_dir)
    assert res["completed_parts"] == list(range(32))
    from jsi_spark.io.tableio import SnapshotTable
    for tbl in ("violations", "verdicts", "metrics", "lineage"):
        assert os.path.isdir(res["tables"][tbl]), tbl
        t = SnapshotTable(str(tmp_path / "validation_out"), tbl)
        df = t.read(spark)
        assert df is not None and df.count() > 0, f"{tbl} empty"

    # resume over the same --out: every bucket already committed → the
    # second run's lineage gains no new committed rows for run 1's parts
    lintbl = SnapshotTable(str(tmp_path / "validation_out"), "lineage")
    lineage_before = lintbl.read(spark).count()
    res2 = _submit(str(tmp_path), zip_path, runner,
                   "validate", "--docs", docs_path, "--out", out_dir)
    assert res2["completed_parts"] == list(range(32))
    lineage_after = lintbl.read(spark).count()
    assert lineage_after == lineage_before, (
        "resume re-committed already-done partition buckets")
