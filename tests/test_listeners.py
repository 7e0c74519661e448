"""Run-listener lifecycle callbacks (SURVEY §2.6 mapping)."""

from __future__ import annotations

from orientdb_etl_spark import Pipeline
from orientdb_etl_spark.listeners import CollectingListener


def test_listener_lifecycle_and_join_not_found(spark, people, depts, tmp_path):
    col = CollectingListener()
    cfg = {
        "extractor": {"table": {"name": "people"}},
        "transformers": [
            {"link": {"joinFieldName": "dept", "lookup": "depts.dept_id",
                       "linkFieldName": "dept_name", "linkValueField": "dept_name",
                       "unresolvedLinkAction": "WARNING"}},
        ],
        "loader": {"parquet": {"path": str(tmp_path / "out")}},
    }
    p = Pipeline(cfg, spark=spark, listener=col.listener())
    p.register_table("people", people)
    p.register_table("depts", depts)
    p.run()
    assert col.events[0] == "begin"
    assert any(e.startswith("join_not_found link") for e in col.events)
    assert col.events[-1].startswith("end rows_loaded=4 warnings=1")


def test_observe_metrics_bridge(spark, people, tmp_path):
    """The config's "observe" section rides the sink action's Observation
    and lands in the listener's on_metrics hook — rows_loaded plus every
    declared aggregate, computed with zero extra passes."""
    col = CollectingListener()
    cfg = {
        "extractor": {"table": {"name": "people"}},
        "observe": {
            "n_null_dept": "count(case when dept is null then 1 end)",
            "max_salary": "max(salary)",
        },
        "loader": {"parquet": {"path": str(tmp_path / "out")}},
    }
    p = Pipeline(cfg, spark=spark, listener=col.listener())
    p.register_table("people", people)
    res = p.run()
    metric_events = [e for e in col.events if e.startswith("metrics ")]
    assert len(metric_events) == 1
    ev = metric_events[0]
    assert "rows_loaded=4" in ev and "max_salary=" in ev and "n_null_dept=" in ev
    assert any(n.startswith("observe max_salary:") for n in res.stats.notes)
