"""spark-submit --py-files packaging smoke test (north_rule: the
engine must be runnable via spark-submit with a zipped package).

Runs the real spark-submit binary in a temp cwd so the only way the
job finds sjot_spark is through the --py-files zip.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")

pytestmark = pytest.mark.skipif(SPARK_SUBMIT is None,
                                reason="spark-submit not on PATH")


def test_zip_contains_package(tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    import make_pyfiles_zip

    out = make_pyfiles_zip.build(str(tmp_path / "sjot_spark.zip"))
    names = zipfile.ZipFile(out).namelist()
    assert "sjot_spark/__init__.py" in names
    assert "sjot_spark/engine.py" in names
    assert "sjot_spark/spec/ranges.py" in names
    assert not any("__pycache__" in n for n in names)


def test_spark_submit_end_to_end(spark, tmp_path):
    sys.path.insert(0, os.path.join(ROOT, "scripts"))
    import make_pyfiles_zip

    from sjot_spark.fixtures import (
        SEQUENCE_SPEC, make_allowed_sources, make_sequences,
    )

    zip_path = make_pyfiles_zip.build(str(tmp_path / "sjot_spark.zip"))
    inp = str(tmp_path / "seq")
    dim = str(tmp_path / "dim")
    make_sequences(spark, 300, violations=True).write.parquet(inp)
    make_allowed_sources(spark).write.parquet(dim)
    spec_file = tmp_path / "spec.json"
    spec_file.write_text(json.dumps(SEQUENCE_SPEC))
    out = str(tmp_path / "runout")

    r = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(ROOT, "scripts", "run_validation.py"),
         "--input", inp, "--spec", str(spec_file), "--out", out,
         "--dims", f"allowed_sources={dim}"],
        capture_output=True, text=True, timeout=420,
        cwd=str(tmp_path),  # package only reachable via --py-files
    )
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["mode"] == "single"
    assert summary["n_violations"] > 0  # seeded corruption found
    assert "fail" in summary["verdicts"].values()
