"""spark-submit --py-files smoke test (the north rule's deployment
mode): zip the package, submit tools/submit_job.py against a small
corpus with the repo NOT on the child's sys.path, and check the JSON
result — proving the engine runs from a shipped archive exactly as a
cluster submit would."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(zip_path: str) -> None:
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "esbulk_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, REPO))


def test_spark_submit_py_files_end_to_end(spark, corpus, tmp_path):
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "..", "lib", "python3.11",
        "site-packages", "pyspark", "bin", "spark-submit",
    )
    corpus_dir = str(tmp_path / "corpus")
    corpus.write.parquet(corpus_dir)
    zip_path = str(tmp_path / "esbulk_spark.zip")
    _zip_package(zip_path)
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_job.py"),
            corpus_dir, str(tmp_path / "idx"), "getUserName",
        ],
        capture_output=True, text=True, timeout=540,
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["n_docs"] == 150
    assert res["total_postings"] > 0
    assert res["hits"], "expected hits for getUserName"
    assert res["hits"][0]["score"] > 0
