"""spark-submit --py-files packaging: the deployment path the north
star prescribes, exercised for real. Builds the zip artifact, runs a
REAL spark-submit subprocess whose working directory does NOT contain
the package (so every import must resolve from the --py-files zip),
and checks the routed sink outputs.

Kept to one submit (generate + parse + route in a single driver app)
because each spark-submit pays a full JVM boot.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER_APP = """
import sys
from hnormalise_spark import get_spark, datagen
from hnormalise_spark.pipeline import normalise_tokens
from hnormalise_spark import sinks

out = sys.argv[1]
spark = get_spark(app_name="submit-test")
df = datagen.raw_sequences(spark, 2000)
parsed = normalise_tokens(df)
paths = sinks.run_batch(spark, parsed, out, json_line=False)
counts = spark.read.parquet(paths["counts"])
from pyspark.sql import functions as F
agg = counts.groupBy("parse_ok").agg(F.sum("n").alias("n")).collect()
n = {r["parse_ok"]: r["n"] for r in agg}
print("SUBMIT_OK", n.get(True, 0), n.get(False, 0))
"""


def test_spark_submit_py_files_zip(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import package

    zip_path = package.build(str(tmp_path / "dist"))
    assert os.path.exists(zip_path)

    app = tmp_path / "app.py"
    app.write_text(DRIVER_APP)
    out_dir = str(tmp_path / "out")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from the zip
    env["SPARK_GRAFT_CPUS"] = "4"
    proc = subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--py-files", zip_path,
            str(app), out_dir,
        ],
        cwd=str(tmp_path),  # package not importable from here
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    ok_line = [l for l in proc.stdout.splitlines() if l.startswith("SUBMIT_OK")]
    assert ok_line, proc.stdout[-2000:]
    _tag, succ, fail = ok_line[0].split()
    # the deterministic corpus parses mostly-success with a junk tail
    assert int(succ) > 0 and int(fail) > 0
    assert os.path.isdir(out_dir)


def test_package_zip_is_deterministic(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import hashlib

    import package

    a = package.build(str(tmp_path / "a"))
    b = package.build(str(tmp_path / "b"))
    ha = hashlib.md5(open(a, "rb").read()).hexdigest()
    hb = hashlib.md5(open(b, "rb").read()).hexdigest()
    assert ha == hb
