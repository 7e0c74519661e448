"""HTTP/stdin source paths, merge dedupeIncoming, and property-based CSV
inference (hypothesis) — the corners the integration tests don't reach."""

from __future__ import annotations

import http.server
import io
import threading

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from orientdb_etl_spark import Pipeline
from orientdb_etl_spark.operators.core import _infer_csv_schema


# --------------------------------------------------------------------------
# http source
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def http_server():
    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            body = b"id;name\n1;alpha\n2;beta\n"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # silence
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/data.csv"
    srv.shutdown()


def test_http_source_staged_and_parsed(spark, http_server):
    p = Pipeline(
        {
            "source": {"http": {"url": http_server}},
            "extractor": {"csv": {"separator": ";", "columnsOnFirstLine": True,
                                   "schema": "id LONG, name STRING"}},
        },
        spark=spark,
    )
    rows = {r.id: r.name for r in p.compile().collect()}
    assert rows == {1: "alpha", 2: "beta"}


def test_stdin_source(spark, monkeypatch):
    monkeypatch.setattr("sys.stdin", io.StringIO("x\ny\nz\n"))
    p = Pipeline({"source": {"input": {}}, "extractor": {"row": {}}}, spark=spark)
    vals = sorted(r.value for r in p.compile().collect())
    assert vals == ["x", "y", "z"]


# --------------------------------------------------------------------------
# merge dedupeIncoming (within-batch self-visibility answer, SURVEY §4.2)
# --------------------------------------------------------------------------


def test_merge_dedupe_incoming_keeps_last(spark, people):
    incoming = spark.createDataFrame(
        [(1, "v1", 10), (1, "v2", 20), (2, "w1", 5)],
        "id int, val string, seq int",
    )
    p = Pipeline(
        {
            "extractor": {"table": {"name": "incoming"}},
            "transformers": [
                {"merge": {"joinFieldName": "id", "lookup": "people.id",
                            "dedupeIncoming": "seq"}},
            ],
        },
        spark=spark,
    )
    p.register_table("incoming", incoming)
    p.register_table("people", people)
    out = {r.id: r.val for r in p.compile().collect()}
    assert out == {1: "v2", 2: "w1"}  # highest seq wins per key


# --------------------------------------------------------------------------
# CSV inference properties (reference rules, OCSVTransformer.java:141-166)
# --------------------------------------------------------------------------


@given(st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=20))
@settings(max_examples=50, deadline=None)
def test_infer_all_ints_is_long(vals):
    schema = _infer_csv_schema([str(v) for v in vals], ",", '"', None)
    assert schema.fields[0].dataType == T.LongType()


@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32),
        min_size=1, max_size=20,
    )
)
@settings(max_examples=50, deadline=None)
def test_infer_floats_never_narrower_than_double(vals):
    lines = [repr(float(v)) for v in vals]
    schema = _infer_csv_schema(lines, ",", '"', None)
    # repr of a float contains '.' or 'e' → double (long only if int-like)
    assert schema.fields[0].dataType in (T.DoubleType(), T.LongType())
    if any("." in ln or "e" in ln for ln in lines):
        assert schema.fields[0].dataType == T.DoubleType()


@given(st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=10))
@settings(max_examples=50, deadline=None)
def test_infer_never_crashes_and_types_are_valid(texts):
    # arbitrary text (may contain separators/quotes) must yield a schema
    # whose width covers every parsed row — no exceptions, no narrowing
    lines = [t.replace("\n", " ").replace("\r", " ") for t in texts]
    schema = _infer_csv_schema(lines, ",", '"', None)
    assert all(
        f.dataType in (T.StringType(), T.LongType(), T.DoubleType())
        for f in schema.fields
    )


@given(
    st.lists(
        st.one_of(st.integers(-1000, 1000), st.text(["a", "b", "c"], max_size=5)),
        min_size=2, max_size=20,
    )
)
@settings(max_examples=50, deadline=None)
def test_infer_mixed_column_widens_to_string(vals):
    lines = [str(v) for v in vals]
    has_int = any(isinstance(v, int) for v in vals)
    has_text = any(isinstance(v, str) and v and not v.lstrip("+-").isdigit() for v in vals)
    schema = _infer_csv_schema(lines, ",", '"', None)
    if has_int and has_text and schema.fields:
        assert schema.fields[0].dataType == T.StringType()


def test_events_reader_repins_utc_under_foreign_session_tz(spark):
    # the driver may boot the session in any host TZ; _t must repin UTC so
    # hour bucketing matches the TZ-naive DuckDB oracle
    import __spark_entry__ as E

    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ev = E._t(spark, "/root/testdata/sf0.001", "events")
        assert dict(ev.dtypes)["ts"] == "timestamp"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        n = ev.count()
        assert n > 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


# --------------------------------------------------------------------------
# manifest-scale distributed ingestion (sources/manifest.py)
# --------------------------------------------------------------------------


def _write_shards(tmp_path, n=4, lines_per=5, gz_last=False):
    import gzip

    paths = []
    for i in range(n):
        body = "".join(f"s{i}-line{j}\n" for j in range(lines_per))
        if gz_last and i == n - 1:
            p = tmp_path / f"shard-{i}.txt.gz"
            p.write_bytes(gzip.compress(body.encode()))
        else:
            p = tmp_path / f"shard-{i}.txt"
            p.write_text(body)
        paths.append(str(p))
    return paths


def test_manifest_lines_local_paths_and_gz(spark, tmp_path):
    from orientdb_etl_spark.sources.manifest import fetch_manifest

    paths = _write_shards(tmp_path, n=4, lines_per=5, gz_last=True)
    out = fetch_manifest(paths, spark=spark, mode="lines")
    rows = out.collect()
    assert len(rows) == 20
    vals = {(r.url.rsplit("/", 1)[-1], r.line_no, r.value) for r in rows}
    assert ("shard-0.txt", 1, "s0-line0") in vals
    # the .gz shard decompresses transparently (codec parity w/ spark.read)
    assert ("shard-3.txt.gz", 5, "s3-line4") in vals


def test_manifest_fetch_runs_in_multiple_tasks(spark, tmp_path):
    """The point of manifest mode: the fetch is EXECUTOR-side and spread
    across tasks, not a driver loop. With >1 url the output must come
    from more than one Spark partition."""
    from pyspark.sql import functions as F

    from orientdb_etl_spark.sources.manifest import fetch_manifest

    paths = _write_shards(tmp_path, n=8)
    out = fetch_manifest(paths, spark=spark, mode="binary")
    n_parts = out.select(F.spark_partition_id().alias("p")).distinct().count()
    assert n_parts > 1
    assert out.count() == 8


def test_manifest_binary_content_roundtrip(spark, tmp_path):
    from orientdb_etl_spark.sources.manifest import fetch_manifest

    p = tmp_path / "blob.bin"
    payload = bytes(range(256))
    p.write_bytes(payload)
    out = fetch_manifest([str(p)], spark=spark, mode="binary", decompress=False)
    r = out.collect()[0]
    assert r.status == 200 and bytes(r.content) == payload and r.error is None


def test_manifest_on_error_keep_vs_fail(spark, tmp_path):
    import pytest

    from orientdb_etl_spark.sources.manifest import fetch_manifest

    good = _write_shards(tmp_path, n=1, lines_per=2)[0]
    bad = str(tmp_path / "missing.txt")
    kept = fetch_manifest(
        [good, bad], spark=spark, mode="binary", retries=0, on_error="keep"
    ).collect()
    by_url = {r.url: r for r in kept}
    assert by_url[good].status == 200 and by_url[good].error is None
    assert by_url[bad].status == -1 and by_url[bad].content is None
    assert "FileNotFoundError" in by_url[bad].error
    # lines mode: failed urls contribute zero lines, good ones all theirs
    lines = fetch_manifest(
        [good, bad], spark=spark, mode="lines", retries=0, on_error="keep"
    ).collect()
    assert len(lines) == 2 and {r.url for r in lines} == {good}
    with pytest.raises(Exception, match="fetch failed"):
        fetch_manifest(
            [good, bad], spark=spark, mode="binary", retries=0, on_error="fail"
        ).collect()


def test_manifest_resume_skips_recorded_urls(spark, tmp_path):
    """statePath resume contract: URLs recorded by record_manifest_state
    are anti-joined out before dispatch, dead-letters are NOT recorded
    (they retry), and a cold-start state path is not an error."""
    from orientdb_etl_spark.sources.manifest import (
        fetch_manifest,
        record_manifest_state,
    )

    shards = _write_shards(tmp_path, n=4, lines_per=2)
    bad = str(tmp_path / "missing.txt")
    state = str(tmp_path / "state")
    # run 1 (cold start — state dir does not exist yet): 4 good + 1 dead
    run1 = fetch_manifest(
        shards + [bad], spark=spark, mode="binary", retries=0,
        on_error="keep", state_path=state,
    ).localCheckpoint(eager=True)
    assert run1.count() == 5
    assert record_manifest_state(run1, state) == 4  # dead-letter excluded
    # run 2 over the same manifest + one NEW shard: only the delta
    # (new shard + prior dead-letter) is dispatched
    (tmp_path / "n2").mkdir()
    new = _write_shards(tmp_path / "n2", n=1, lines_per=2)
    run2 = fetch_manifest(
        shards + [bad] + new, spark=spark, mode="binary", retries=0,
        on_error="keep", state_path=state,
    ).localCheckpoint(eager=True)
    urls2 = {r.url for r in run2.collect()}
    assert urls2 == {bad, new[0]}
    assert record_manifest_state(run2, state) == 1  # just the new shard
    # run 3: everything good is done; only the dead-letter retries
    run3 = fetch_manifest(
        shards + [bad] + new, spark=spark, mode="binary", retries=0,
        on_error="keep", state_path=state,
    )
    assert {r.url for r in run3.collect()} == {bad}


def test_manifest_lines_empty_shard_marker_row(spark, tmp_path):
    """A successfully fetched EMPTY shard emits a (line_no=0, status=200)
    marker row under error_rows=True, so resume state can mark it done —
    and it is distinguishable from a dead-letter (status=-1)."""
    from orientdb_etl_spark.sources.manifest import (
        fetch_manifest,
        record_manifest_state,
    )

    good = _write_shards(tmp_path, n=1, lines_per=2)[0]
    empty = str(tmp_path / "empty.txt")
    open(empty, "w").close()
    bad = str(tmp_path / "missing.txt")
    out = fetch_manifest(
        [good, empty, bad], spark=spark, mode="lines", retries=0,
        on_error="keep", error_rows=True,
    ).localCheckpoint(eager=True)
    by = {(r.url, r.line_no): r for r in out.collect()}
    assert by[(empty, 0)].status == 200 and by[(empty, 0)].error is None
    assert by[(bad, 0)].status == -1 and by[(bad, 0)].error is not None
    state = str(tmp_path / "state")
    assert record_manifest_state(out, state) == 2  # good + empty, not bad
    again = fetch_manifest(
        [good, empty, bad], spark=spark, mode="lines", retries=0,
        on_error="keep", error_rows=True, state_path=state,
    )
    assert {r.url for r in again.collect()} == {bad}


def test_manifest_resume_lines_mode_records_present_urls(spark, tmp_path):
    """Plain lines mode has no status column: every URL present in the
    output is a success by construction and gets recorded."""
    from orientdb_etl_spark.sources.manifest import (
        fetch_manifest,
        record_manifest_state,
    )

    shards = _write_shards(tmp_path, n=3, lines_per=2)
    state = str(tmp_path / "state")
    out = fetch_manifest(
        shards, spark=spark, mode="lines", state_path=state
    ).localCheckpoint(eager=True)
    assert record_manifest_state(out, state) == 3
    again = fetch_manifest(
        shards, spark=spark, mode="lines", state_path=state
    )
    assert again.count() == 0


def test_manifest_path_config_reads_distributed(spark, tmp_path):
    """{"http": {"manifestPath": ...}} + row extractor through the full
    Pipeline surface: comments/blank lines dropped, lines carry url
    provenance, csv transformer composes on the value column."""
    from orientdb_etl_spark import Pipeline

    paths = _write_shards(tmp_path, n=3, lines_per=2)
    man = tmp_path / "manifest.txt"
    man.write_text("# fixture manifest\n\n" + "\n".join(paths) + "\n")
    p = Pipeline(
        {
            "source": {"files": {"manifestPath": str(man)}},
            "extractor": {"row": {}},
        },
        spark=spark,
    )
    rows = p.compile().collect()
    assert len(rows) == 6
    assert {r.url for r in rows} == set(paths)
    assert all(r.value.startswith("s") for r in rows)


def test_manifest_lines_error_rows(spark, tmp_path):
    from orientdb_etl_spark.sources.manifest import fetch_manifest

    good = _write_shards(tmp_path, n=1, lines_per=2)[0]
    bad = str(tmp_path / "missing.txt")
    rows = fetch_manifest(
        [good, bad], spark=spark, mode="lines", retries=0,
        on_error="keep", error_rows=True,
    ).collect()
    # failed url -> exactly one row with line_no=0 / NULL value / error;
    # good url keeps its numbered lines with error NULL
    by = {}
    for r in rows:
        by.setdefault(r.url, []).append(r)
    assert len(by[bad]) == 1
    e = by[bad][0]
    assert e.line_no == 0 and e.value is None and e.status == -1
    assert "FileNotFoundError" in e.error
    assert [r.line_no for r in sorted(by[good], key=lambda r: r.line_no)] == [1, 2]
    assert all(r.error is None for r in by[good])


# ------------------------------------------------------- cluster profile


def test_cluster_profile_round_trip(spark):
    """Every key in the 100 TB profile is a runtime-settable SQL conf
    that takes effect on a live session (SCALE.md 'Cluster posture'),
    and the sizing math follows the documented mapping."""
    from orientdb_etl_spark import cluster_profile

    prof = cluster_profile(total_cores=4000, executor_mem_gb=32,
                           executor_cores=8)
    assert prof["spark.sql.shuffle.partitions"] == str(3 * 4000)
    assert prof["spark.sql.adaptive.enabled"] == "true"
    assert prof["spark.sql.adaptive.skewJoin.enabled"] == "true"
    # sizing DERIVES from the executor shape (32 GB / 8 cores ->
    # 4 GB/task -> 128 MB advisory; broadcast = mem/128 = 256 MB)
    assert prof["spark.sql.adaptive.advisoryPartitionSizeInBytes"] == "128m"
    assert prof["spark.sql.autoBroadcastJoinThreshold"] == str(
        256 * 1024 * 1024
    )
    small = cluster_profile(total_cores=4000, executor_mem_gb=16,
                            executor_cores=16)
    # 1 GB/task -> 32 MB advisory (clamped floor), 64 MB scan granularity,
    # 128 MB broadcast ceiling — smaller executors, smaller appetites
    assert small["spark.sql.adaptive.advisoryPartitionSizeInBytes"] == "32m"
    assert small["spark.sql.files.maxPartitionBytes"] == str(64 * 1024 * 1024)
    assert small["spark.sql.autoBroadcastJoinThreshold"] == str(
        128 * 1024 * 1024
    )
    saved = {}
    try:
        for k, v in prof.items():
            saved[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)  # raises if the key is not settable
            assert spark.conf.get(k) == v
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    import pytest

    with pytest.raises(ValueError):
        cluster_profile(total_cores=0)


def test_manifest_state_records_delta_only(spark, tmp_path):
    """Re-recording an already-done URL set appends NOTHING: the state
    stays O(distinct URLs), not O(runs × URLs) — the merge-sink
    read-back path re-feeds the full cumulative success set every run,
    and without the anti-join the state (and the resume anti-join build
    side) would grow linearly in the number of runs."""
    from orientdb_etl_spark.sources.manifest import record_manifest_state

    frame = spark.createDataFrame([("u1",), ("u2",)], "url string")
    state = str(tmp_path / "state")
    assert record_manifest_state(frame, state) == 2
    assert record_manifest_state(frame, state) == 0  # no delta
    assert spark.read.parquet(state).count() == 2  # not 4
    wider = frame.unionByName(
        spark.createDataFrame([("u3",)], "url string")
    )
    assert record_manifest_state(wider, state) == 1  # just the new URL
    assert spark.read.parquet(state).count() == 3


def test_manifest_state_require_status(spark, tmp_path):
    """Binary/text recording REQUIRES the status column (dead-letter
    rows are IN the output there as status=-1): a transformer chain that
    dropped it raises instead of silently recording failures as done.
    Lines mode keeps the permissive default (failures emit no rows)."""
    import pytest

    from orientdb_etl_spark.sources.manifest import record_manifest_state

    no_status = spark.createDataFrame([("u1",)], "url string")
    with pytest.raises(ValueError, match="status"):
        record_manifest_state(
            no_status, str(tmp_path / "s1"), require_status=True
        )
    frame = spark.createDataFrame(
        [("ok", 200), ("dead", -1)], "url string, status int"
    )
    assert (
        record_manifest_state(frame, str(tmp_path / "s2"), require_status=True)
        == 1
    )


def test_pipeline_recordstate_guards(spark, tmp_path):
    """Config-pipeline recordState contracts: (a) a lazy loader
    (memory/view) raises — nothing durable is committed, so recording
    would silently skip those URLs' data forever; (b) a binary pipeline
    whose transformers dropped 'status' raises rather than recording
    dead-letters as done; (c) a non-parquet action sink (csv) records
    from the SAME pinned materialization the sink wrote — successes
    recorded once, dead-letters retried."""
    import pytest

    from orientdb_etl_spark import Pipeline

    good = tmp_path / "blob-0.bin"
    good.write_bytes(b"\x01" * 8)
    bad = str(tmp_path / "missing.bin")
    manifest = tmp_path / "manifest.txt"
    manifest.write_text(f"{good}\n{bad}\n")
    state = str(tmp_path / "state")
    base = {
        "source": {"files": {
            "manifestPath": str(manifest), "statePath": state,
            "recordState": True, "onError": "keep", "retries": 0,
        }},
        "extractor": {"binary": {}},
    }
    with pytest.raises(ValueError, match="action loader"):
        Pipeline({**base, "loader": {"memory": {}}}, spark=spark).run()
    with pytest.raises(ValueError, match="status"):
        Pipeline(
            {
                **base,
                "transformers": [
                    {"field": {"operation": "remove",
                               "fieldNames": ["status", "content", "error"]}},
                ],
                "loader": {"csv": {"path": str(tmp_path / "out_bad")}},
            },
            spark=spark,
        ).run()
    # healthy csv-sink run: status kept, binary content dropped for csv
    r = Pipeline(
        {
            **base,
            "transformers": [
                {"field": {"fieldName": "n_bytes",
                           "expression": "length(content)"}},
                {"field": {"operation": "remove",
                           "fieldNames": ["content", "error"]}},
            ],
            "loader": {"csv": {"path": str(tmp_path / "out_ok")}},
        },
        spark=spark,
    ).run()
    assert any("manifest state recorded: 1" in n for n in r.stats.notes)
    recorded = {r2.url for r2 in spark.read.parquet(state).collect()}
    assert recorded == {str(good)}  # dead-letter NOT recorded — it retries
