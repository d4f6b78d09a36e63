"""North-rule packaging gate: the pipeline runs via spark-submit --py-files.

The rule's deployment clause is "run via spark-submit --py-files on a
multi-executor cluster". Everything else in the suite drives the pipeline
through an in-process SparkSession that imports the package from the repo
checkout — which would hide two whole failure classes: a package that only
imports because the repo is on PYTHONPATH (relative-path data files, import
side effects touching the checkout), and a driver script that silently
overrides the submit-side master. This test runs the real `spark-submit`
binary as a subprocess with the package shipped ONLY as a zip (PYTHONPATH
scrubbed, cwd outside the repo), local master standing in for the cluster
per the sandbox rule, and gates the submitted run on the same pairwise-F1
bar as the in-process e2e run.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit_bin() -> str | None:
    import pyspark

    p = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    return p if os.path.exists(p) else None


def test_pipeline_via_spark_submit_pyfiles(tmp_path, e2e_dir):
    submit = _spark_submit_bin()
    if submit is None:  # pragma: no cover - pyspark always ships it
        pytest.skip("pyspark install has no bin/spark-submit")

    # Build the --py-files artifact exactly as a deploy would.
    dist = tmp_path / "dist"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles_zip.py"),
         str(dist)],
        check=True, cwd=REPO, capture_output=True,
    )
    zip_path = dist / "productbert_intermediate_spark.zip"
    assert zip_path.exists()

    # The package must arrive via --py-files alone: scrub PYTHONPATH and run
    # from a cwd outside the repo (the driver script's own dir, scripts/,
    # does not contain the package either).
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    report_path = tmp_path / "report.json"
    cmd = [
        submit,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--py-files", str(zip_path),
        os.path.join(REPO, "scripts", "submit_pipeline.py"),
        "--pages", f"{e2e_dir}/pages.parquet",
        "--workdir", str(tmp_path / "work"),
        "--labeled", f"{e2e_dir}/labeled_pairs_gs.parquet",
        "--report", str(report_path),
    ]
    proc = subprocess.run(
        cmd, cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])

    report = json.loads(report_path.read_text())
    f1 = report["pairwise_eval"]["f1"]
    assert f1 is not None and f1 >= 0.99, report["pairwise_eval"]


def test_pyfiles_zip_is_deterministic(tmp_path):
    """Identical source tree → byte-identical artifact (stable deploy hash)."""
    outs = []
    for sub in ("a", "b"):
        r = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "make_pyfiles_zip.py"),
             str(tmp_path / sub)],
            check=True, cwd=REPO, capture_output=True, text=True,
        )
        outs.append(r.stdout.strip().split("sha256=")[1])
    assert outs[0] == outs[1]
    # and it contains the package root, not bare modules
    import zipfile

    with zipfile.ZipFile(tmp_path / "a" / "productbert_intermediate_spark.zip") as zf:
        names = zf.namelist()
    assert "productbert_intermediate_spark/__init__.py" in names
    assert not any(n.endswith(".pyc") or "__pycache__" in n for n in names)


def test_linkage_via_spark_submit_pyfiles(tmp_path, e2e_dir):
    """Same packaging gate for the linkage driver (scripts/submit_linkage.py):
    two catalogs from a deterministic url-hash split of the e2e corpus,
    package via --py-files only, report gated on non-empty stage counts."""
    submit = _spark_submit_bin()
    if submit is None:  # pragma: no cover
        pytest.skip("pyspark install has no bin/spark-submit")

    import hashlib

    import pandas as pd

    pdf = pd.read_parquet(f"{e2e_dir}/pages.parquet")
    # re-written parquet must keep microsecond timestamps for Spark's reader
    pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us]")
    side = pdf["url"].map(
        lambda u: int(hashlib.md5(u.encode()).hexdigest(), 16) % 2
    )
    lp, rp = tmp_path / "left_pages.parquet", tmp_path / "right_pages.parquet"
    pdf[side == 0].to_parquet(lp, index=False, row_group_size=512)
    pdf[side == 1].to_parquet(rp, index=False, row_group_size=512)

    dist = tmp_path / "dist"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles_zip.py"),
         str(dist)],
        check=True, cwd=REPO, capture_output=True,
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    report_path = tmp_path / "link_report.json"
    cmd = [
        submit,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--py-files", str(dist / "productbert_intermediate_spark.zip"),
        os.path.join(REPO, "scripts", "submit_linkage.py"),
        "--left-pages", str(lp),
        "--right-pages", str(rp),
        "--workdir", str(tmp_path / "link_work"),
        "--report", str(report_path),
    ]
    proc = subprocess.run(
        cmd, cwd=str(tmp_path), env=env,
        capture_output=True, text=True, timeout=1200,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])

    report = json.loads(report_path.read_text())
    c = report["counts"]
    assert c["offers_left"] > 0 and c["offers_right"] > 0
    assert 0 < c["link_matches"] <= c["link_scored"] <= c["link_candidates"]
    # the matched table landed as a readable stage under --workdir
    matches = pd.read_parquet(
        str(tmp_path / "link_work" / "link_matches")
    )
    assert len(matches) == c["link_matches"]
    assert matches["id_l"].is_unique and matches["id_r"].is_unique
