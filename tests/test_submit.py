"""spark-submit --py-files packaging: generate → index(+extract check, merge)
→ search as three real cluster-style job submissions (north-rule packaging
requirement, run against local master as the sandbox cluster proxy)."""

import json
import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


def _submit(tmp, zip_path, *args):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--py-files", zip_path,
        os.path.join(tmp, "driver.py"),
        *args,
    ]
    res = subprocess.run(
        cmd, capture_output=True, text=True, timeout=600, cwd=tmp, env=env
    )
    assert res.returncode == 0, res.stderr[-4000:]
    lines = [l for l in res.stdout.strip().splitlines() if l.startswith("{")]
    return json.loads(lines[-1])


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_submit_generate_index_search(tmp_path):
    from lucene_spark.make_pyfiles import build_zip

    tmp = str(tmp_path)
    zip_path = build_zip(os.path.join(tmp, "lucene_spark.zip"))
    # driver script detached from the repo: imports must resolve via --py-files
    shutil.copy(os.path.join(REPO, "lucene_spark", "cli.py"), os.path.join(tmp, "driver.py"))

    pages = os.path.join(tmp, "pages")
    idx = os.path.join(tmp, "idx")
    out = _submit(tmp, zip_path, "generate", "--output", pages, "--n-docs", "300",
                  "--partitions", "8")
    assert out["n_docs"] == 300

    out = _submit(
        tmp, zip_path, "index", "--input", pages, "--index-dir", idx,
        "--n-segments", "8", "--from-html", "--check-extraction", "--merge",
    )
    assert out["n_docs_new"] == 300
    assert "merge" in out

    out = _submit(tmp, zip_path, "search", "--index-dir", idx,
                  "--query", "t0000 AND t0001", "--k", "5")
    hits = out["hits"]
    assert 1 <= len(hits) <= 5
    scores = [h["score"] for h in hits]
    assert scores == sorted(scores, reverse=True)
    assert all(h["key"].startswith("https://") for h in hits)
