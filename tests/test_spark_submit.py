"""Executed evidence for the deployment shape the north star names:
``spark-submit --py-files`` launching the YAML-configured pipeline
(``scripts/submit.sh``) in a FRESH JVM/Python process, with the
library shipped as a zip — not imported from the repo working
directory. The in-process planner tests can't catch packaging bugs
(missing subpackage in the zip, repo-relative imports, argv wiring);
this one does, the same way the reference gates on
``go run agent.go -c config.yml`` (Makefile:37-41)."""

from __future__ import annotations

import os
import subprocess
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUBMIT = os.path.join(REPO, "scripts", "submit.sh")


def test_submit_sh_runs_pipeline_end_to_end(tmp_path):
    lines = [f"2020-11-13 11:28:{i:02d} hello world" for i in range(25)]
    inp = tmp_path / "input-test.txt"
    inp.write_text("\n".join(lines) + "\n")
    out = tmp_path / "out"
    cfg = tmp_path / "pipeline.yml"
    cfg.write_text(
        textwrap.dedent(
            f"""
            input: {{target: file, path: "{inp}"}}
            pipeline:
              formatters: [forwarder]
            output: {{target: parquet, path: "{out}"}}
            """
        )
    )
    env = dict(os.environ)
    # the zip must be the ONLY way the executor/driver finds the
    # package — guard against the test passing via a stale PYTHONPATH
    env.pop("PYTHONPATH", None)
    env.setdefault("SPARK_GRAFT_CPUS", "4")
    proc = subprocess.run(
        ["bash", SUBMIT, "local[4]", str(cfg)],
        cwd=str(tmp_path),  # NOT the repo root: imports must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"

    import duckdb

    got = sorted(
        r[0]
        for r in duckdb.sql(f"SELECT message FROM '{out}/*.parquet'").fetchall()
    )
    assert got == sorted(lines)
