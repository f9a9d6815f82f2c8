"""CLI (send command) + YAML config parity tests."""

from __future__ import annotations

import json
import subprocess
import sys

from clickstreamtoclickhouse_spark import config as config_mod

from .conftest import SF_DIR
from .test_ingest import FIXTURE_LINES


def test_config_from_yaml(tmp_path):
    p = tmp_path / "conf.yml"
    p.write_text(
        """
apps:
  - write_key: wk-1
    name: appOne
  - write_key: wk-1
    name: appOne
warehouses:
  - type: parquet
    root: /tmp/lake
skip_fields: [ip, channel]
extra_timestamps:
  - name: ist_timestamp
    timezone: Asia/Kolkata
"""
    )
    conf = config_mod.from_yaml(str(p))
    assert len(conf.apps) == 1  # set-dedup like the reference
    assert conf.warehouses[0].kind == "parquet"
    assert conf.skip_fields == ("ip", "channel")
    assert conf.extra_timestamps == {"ist_timestamp": "Asia/Kolkata"}


def test_cli_send_end_to_end(tmp_path):
    src = tmp_path / "landing"
    src.mkdir()
    with open(src / "events.json", "w") as f:
        for line in FIXTURE_LINES:
            f.write(json.dumps(line) + "\n")
    lake = tmp_path / "lake"
    # run the CLI as a user would (subprocess, module entry point);
    # small session via env to keep the test fast
    env = {"SPARK_GRAFT_CPUS": "4", "SPARK_DRIVER_MEM": "4g"}
    import os

    proc = subprocess.run(
        [
            sys.executable, "-m", "clickstreamtoclickhouse_spark", "send",
            "--source-dir", str(src),
            "--namespace", "myApp",
            "--warehouse-root", str(lake),
        ],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
        env={**os.environ, **env},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # namespace decamelized; tables materialized
    assert (lake / "my_app" / "tracks").exists()
    assert (lake / "my_app" / "users").exists()
    assert (lake / "my_app" / "product_viewed").exists()
    assert "1 unparseable" not in proc.stderr  # no corrupt lines here


def test_cli_list_queries_and_explain(spark, capsys):
    from clickstreamtoclickhouse_spark.app import main

    assert main(["list-queries"]) == 0
    out = capsys.readouterr().out
    assert "O daily_events" in out and "O media_features" in out
    # round 7: every registered query carries an oracle — no R rows
    assert "\nR " not in out and not out.startswith("R ")

    assert main(["explain", "daily_events", "--sf-dir", SF_DIR]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "Scan parquet" in out

    assert main(["explain", "not_a_query"]) == 2


def test_cli_run_query(spark, capsys, tmp_path):
    from clickstreamtoclickhouse_spark.app import main

    from .conftest import SF_DIR

    assert main(["run", "mktsegment_stats", "--sf-dir", SF_DIR,
                 "--format", "json"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    import json as _json

    rows = [_json.loads(l) for l in out if l.startswith("{")]
    assert rows and all("c_mktsegment" in r for r in rows)
    # parquet output path: full distributed write, re-readable
    dest = str(tmp_path / "out.parquet")
    assert main(["run", "mktsegment_stats", "--sf-dir", SF_DIR,
                 "--output", dest]) == 0
    assert spark.read.parquet(dest).count() == len(rows)
    assert main(["run", "not_a_query"]) == 2
