"""spark-submit --py-files deployment path (the north rule's run mode).

The reference ships as a pip console script (`simages` entry point,
setup.py); the Spark-native shipping artifact is a --py-files zip handed
to spark-submit. These tests prove the zip is (a) deterministic and
(b) SUFFICIENT: a driver launched with cwd outside the repo and a
scrubbed PYTHONPATH resolves every simages_spark import from the zip
alone and runs the dedup pipeline — exactly what a real cluster's
driver + executors would receive.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from make_pyfiles_zip import build_zip  # noqa: E402


def test_zip_is_deterministic(tmp_path):
    a = build_zip(str(tmp_path / "a.zip"))
    b = build_zip(str(tmp_path / "b.zip"))
    with open(a, "rb") as fa, open(b, "rb") as fb:
        assert fa.read() == fb.read()
    # and contains the package, not the repo root clutter
    import zipfile

    names = zipfile.ZipFile(a).namelist()
    assert "simages_spark/__init__.py" in names
    assert all(n.startswith("simages_spark/") for n in names)


_DRIVER = """
import json
from simages_spark.benchmarks import import_provenance
prov = import_provenance()
assert prov["from_zip"], f"imported from {prov['path']!r}, not the zip"

from simages_spark.config import DedupConfig
from simages_spark.pipeline import find_duplicates
from simages_spark.session import get_spark
from simages_spark.sources.corpus import generate_pages, mint_doc_ids

spark = get_spark("submit_smoke", cores=4, shuffle_partitions=4)
docs = mint_doc_ids(generate_pages(spark, 400, seed=7, partitions=4)).select(
    "doc_id", "text"
)
res = find_duplicates(docs, DedupConfig())
print("RESULT " + json.dumps({
    "provenance": prov,
    "n_docs": docs.count(),
    "n_cluster_rows": res.clusters.count(),
}))
spark.stop()
"""


def test_submit_py_files_runs_pipeline(spark, tmp_path):
    """End-to-end: spark-submit --py-files dist zip, import-from-zip
    asserted in-driver, pipeline produces the same cluster rows as an
    in-process run on the identical deterministic corpus."""
    if shutil.which("spark-submit") is None:
        pytest.skip("spark-submit not on PATH")
    zip_path = build_zip(str(tmp_path / "simages_spark.zip"))
    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be sufficient
    env.setdefault("PYSPARK_PYTHON", sys.executable)
    env.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--driver-memory", "4g",
            "--py-files", zip_path,
            str(driver),
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # outside the repo: no implicit repo imports
        env=env,
        timeout=600,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
    assert lines, f"no RESULT line\nstdout:{proc.stdout[-2000:]}\nstderr:{proc.stderr[-2000:]}"
    out = json.loads(lines[-1][len("RESULT "):])
    assert out["provenance"]["from_zip"]
    assert out["n_docs"] == 400

    # same corpus in-process (the test session) must agree exactly —
    # determinism across launch modes, not just within one
    from simages_spark.config import DedupConfig
    from simages_spark.pipeline import find_duplicates
    from simages_spark.sources.corpus import generate_pages, mint_doc_ids

    docs = mint_doc_ids(generate_pages(spark, 400, seed=7, partitions=4)).select(
        "doc_id", "text"
    )
    assert find_duplicates(docs, DedupConfig()).clusters.count() == out[
        "n_cluster_rows"
    ]
