"""CLI runner (python -m orientdb_etl_spark) — SURVEY §3.1 lifecycle."""

from __future__ import annotations

import json


def test_cli_run_with_variables(spark, tmp_path, capsys):
    cfg = {
        "extractor": {"parquet": {"path": "/root/testdata/sf0.001/nation.parquet"}},
        "transformers": [
            {"filter": {"condition": "n_regionkey = ${region}"}},
        ],
        "loader": {"parquet": {"path": str(tmp_path / "out")}},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    from orientdb_etl_spark.__main__ import main

    rc = main([str(cfg_path), "-region=1"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["status"] == "ok" and report["rows_loaded"] == 5
    assert spark.read.parquet(str(tmp_path / "out")).count() == 5


def test_cli_halt_exit_code(spark, tmp_path, capsys):
    cfg = {
        "extractor": {"parquet": {"path": "/root/testdata/sf0.001/nation.parquet"}},
        "transformers": [
            {"flow": {"operation": "halt", "if": "n_nationkey >= 0"}},
        ],
        "loader": {"parquet": {"path": str(tmp_path / "nope")}},
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    from orientdb_etl_spark.__main__ import main

    assert main([str(cfg_path)]) == 1


def test_cli_usage_errors():
    from orientdb_etl_spark.__main__ import main

    assert main([]) == 2
    assert main(["a.json", "stray", "extra"]) == 2
