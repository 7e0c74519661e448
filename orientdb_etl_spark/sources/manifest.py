"""Manifest-scale distributed ingestion: a DataFrame of URLs → partitioned
executor-side fetch → binary/text/line rows.

The reference's http source streams ONE url on the driver
(OHttpSource.java:36-117); that is honest for a control-plane input, but a
100 TB ingest reads a *manifest* of thousands of URLs (the Common-Crawl
WARC-listing shape). Here the manifest itself is a DataFrame: it is spread
round-robin across the cluster, each task fetches its slice with a bounded
thread pool (fetching is I/O-bound, so threads-per-task × tasks is the
effective download parallelism while the per-task bound keeps any one
worker from hammering a host), and the bytes flow source → executor without
ever touching the driver.

Failure semantics are per-URL, not per-job: with ``on_error='keep'`` a
failed fetch becomes a row (``status=-1``, ``error`` set, ``content``
NULL) after bounded retries, so a million-file ingest survives a dead
link and the retry set is just ``filter(status = -1)`` — rerun only those.
``on_error='fail'`` raises instead, handing the retry to Spark's own task
re-execution (same-zone transient faults).

Determinism: a URL's content is whatever the server returns — the operator
adds no nondeterminism of its own (thread results are collected in manifest
order; line numbers are per-file read order).

Resume: ``state_path`` names a parquet directory of already-fetched URLs.
When set, the manifest is anti-joined against it BEFORE dispatch, so a
re-run of the same manifest downloads only the delta (new shards plus any
prior dead-letters, which are deliberately never recorded as done). The
state is written by :func:`record_manifest_state` after the consumer has
materialized the fetch — recording successes only after the run completes
is what makes a killed run safe: un-recorded shards are simply re-fetched.
At 100 TB the state table is one row per shard (millions, not billions);
the anti-join broadcasts or shuffles by URL exactly like any dim join.
"""

from __future__ import annotations

import gzip
from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read_url(url: str, timeout: float) -> bytes:
    """Fetch one URL's bytes. http(s)/file via urllib; a bare path is a
    local/shared-filesystem file (the 'files' manifest flavor)."""
    if "://" in url:
        import urllib.request

        req = urllib.request.Request(url)
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.read()
    with open(url, "rb") as f:
        return f.read()


def _fetch_one(
    url: str, timeout: float, retries: int, decompress: bool
) -> tuple[int, bytes | None, str | None]:
    import time as _time

    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            data = _read_url(url, timeout)
            if decompress and url.endswith(".gz"):
                data = gzip.decompress(data)
            return 200, data, None
        except Exception as exc:  # noqa: BLE001 — per-URL fault isolation
            last = exc
            if attempt < retries:
                _time.sleep(0.2 * (attempt + 1))
    return -1, None, f"{type(last).__name__}: {last}"


def _read_state(spark: SparkSession, state_path: str) -> DataFrame | None:
    """Completed-URL state from a prior run, or None on cold start (the
    path not existing yet is the normal first-run case, not a fault).
    ONLY path-not-found maps to cold start — any other read failure
    (transient IO, auth, corrupt footer) propagates, because treating it
    as cold start would silently re-dispatch the entire manifest: the
    exact re-download cost the state exists to prevent."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(state_path).select("url").distinct()
    except AnalysisException as exc:
        cond = ""
        try:
            cond = exc.getCondition() or ""
        except Exception:  # noqa: BLE001 — pre-4.0 error shape
            pass
        if "PATH_NOT_FOUND" in cond or "Path does not exist" in str(exc):
            return None
        raise


def record_manifest_state(
    fetched: DataFrame, state_path: str, require_status: bool = False
) -> int:
    """Append the SUCCESSFUL URLs of a materialized fetch to the resume
    state at ``state_path``; returns how many NEW URLs were recorded
    (URLs already present in the state are skipped — the state stays
    O(distinct URLs), not O(runs × URLs), even when the caller re-feeds
    the full cumulative sink contents every run, as the parquet-merge
    read-back path does).

    Success means ``status = 200`` for binary/text mode (and lines mode
    with ``error_rows=True``); plain lines mode carries no status column,
    so every URL present in the output is a success by construction
    (failed URLs emit zero lines under ``on_error='keep'``) — but a
    successfully fetched EMPTY shard is invisible there too and will be
    re-fetched on every resume run; pass ``error_rows=True``, which
    emits a ``(line_no=0, status=200)`` marker row for empty shards, for
    full resume fidelity. Dead-letter URLs are NEVER recorded — the next
    run retries exactly those plus any manifest additions. Call this AFTER the consumer has durably written
    the fetched data: state recorded before the sink commit would turn a
    mid-run crash into silently skipped shards.

    ``require_status=True`` (the right setting for binary/text
    pipelines, and what the config pipeline passes for them) raises if
    the ``status`` column is absent instead of treating every row as a
    success: in those modes dead-letter rows DO reach the sink as
    (status = -1) rows, so a transformer chain that dropped ``status``
    would otherwise record failures as done and never retry them.
    Lines-mode outputs may legitimately omit ``status``, hence the
    default ``False``.

    Concurrent writers: the state is an append-only parquet directory
    and appends are not transactional across processes — two pipelines
    sharing a ``state_path`` may both record an overlapping URL set
    (each read the state before the other's append landed). That is
    harmless for correctness (reads always ``distinct()`` the URL set;
    a double-recorded URL is simply skipped on resume) but wastes state
    rows; give concurrent pipelines separate state dirs when possible.
    """
    cols = fetched.columns
    if "status" in cols:
        ok = fetched.filter(F.col("status") == 200)
    elif require_status:
        raise ValueError(
            "record_manifest_state(require_status=True): the 'status' "
            "column did not survive to the recording point — without it, "
            "dead-letter rows (status = -1) would be recorded as done and "
            "never retried. Keep 'status' through the transformer chain."
        )
    else:
        ok = fetched
    done = ok.select("url").distinct()
    # delta-only append: anti-join against the existing state so each run
    # records only URLs not already marked done (state growth is bounded
    # by the manifest, not by the number of runs)
    existing = _read_state(fetched.sparkSession, state_path)
    if existing is not None:
        done = done.join(existing, "url", "left_anti")
    # pin the URL set once so the append and the returned count read the
    # same materialization instead of re-running the fetch lineage twice
    # (and so the anti-join is resolved BEFORE the append touches the dir)
    done = done.localCheckpoint(eager=True)
    done.write.mode("append").parquet(state_path)
    return done.count()


def fetch_manifest(
    urls: "DataFrame | Sequence[str]",
    spark: SparkSession | None = None,
    url_col: str = "url",
    mode: str = "binary",
    max_concurrency: int = 8,
    timeout: float = 60.0,
    retries: int = 2,
    on_error: str = "keep",
    decompress: bool = True,
    partitions: int | None = None,
    error_rows: bool = False,
    state_path: str | None = None,
) -> DataFrame:
    """Distributed fetch of every URL in a manifest.

    ``urls``: a DataFrame with ``url_col`` (scale path — the manifest can
    itself be a 100M-row table) or a plain list (convenience; requires
    ``spark``). The frame is round-robin repartitioned so fetch work
    spreads evenly regardless of how the manifest was produced.

    ``mode``:
      - ``'binary'`` → one row per URL: (url, status, content binary, error)
      - ``'text'``   → one row per URL: (url, status, text string, error)
      - ``'lines'``  → one row per LINE: (url, line_no, value) — the
        distributed twin of ``spark.read.text`` over fetched bodies.
        By default failed URLs yield ZERO lines under ``on_error='keep'``
        — fine for ad-hoc reads, but a checkpointing consumer would lose
        them silently; pass ``error_rows=True`` to get
        (url, line_no, value, status, error) where each failed URL emits
        exactly one row with ``line_no = 0`` and a NULL value, so the
        caller can dead-letter or retry it.

    ``max_concurrency`` bounds the PER-TASK thread pool; total download
    parallelism is that × the number of tasks. ``decompress`` makes
    ``.gz`` bodies transparent, mirroring Spark's extension-driven codecs.

    ``state_path``: resume state written by :func:`record_manifest_state`
    on a previous run — URLs recorded there are anti-joined out of the
    manifest before any fetch is dispatched (see module docstring for the
    crash-safety argument). A missing/empty state directory means a cold
    start, not an error.
    """
    if mode not in ("binary", "text", "lines"):
        raise ValueError(f"unknown mode {mode!r}")
    if on_error not in ("keep", "fail"):
        raise ValueError(f"unknown on_error {on_error!r}")
    if isinstance(urls, (list, tuple)):
        if spark is None:
            raise ValueError("list manifest needs an explicit spark session")
        urls = spark.createDataFrame([(str(u),) for u in urls], f"{url_col} string")
    manifest = urls.select(F.col(url_col).cast("string").alias("url"))
    if state_path is not None:
        done = _read_state(urls.sparkSession, state_path)
        if done is not None:
            manifest = manifest.join(done, "url", "left_anti")
    n_parts = partitions or urls.sparkSession.sparkContext.defaultParallelism
    manifest = manifest.repartition(n_parts)

    workers = max(1, int(max_concurrency))
    t_out, n_retries, decomp, fail_fast = (
        float(timeout), int(retries), bool(decompress), on_error == "fail"
    )
    with_errors = bool(error_rows) and mode == "lines"

    def _fetch_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        for pdf in it:
            batch_urls = [str(u) for u in pdf["url"]]
            if not batch_urls:
                continue
            with ThreadPoolExecutor(
                max_workers=min(workers, len(batch_urls))
            ) as pool:
                # executor.map preserves manifest order → deterministic rows
                results = list(
                    pool.map(
                        lambda u: _fetch_one(u, t_out, n_retries, decomp),
                        batch_urls,
                    )
                )
            if fail_fast:
                for u, (status, _, err) in zip(batch_urls, results):
                    if status < 0:
                        raise IOError(f"fetch failed for {u}: {err}")
            if mode == "binary":
                yield pd.DataFrame(
                    {
                        "url": batch_urls,
                        "status": pd.array(
                            [r[0] for r in results], dtype="int32"
                        ),
                        "content": [r[1] for r in results],
                        "error": [r[2] for r in results],
                    }
                )
            elif mode == "text":
                yield pd.DataFrame(
                    {
                        "url": batch_urls,
                        "status": pd.array(
                            [r[0] for r in results], dtype="int32"
                        ),
                        "text": [
                            None if r[1] is None else r[1].decode("utf-8", "replace")
                            for r in results
                        ],
                        "error": [r[2] for r in results],
                    }
                )
            else:  # lines
                out_url, out_no, out_val = [], [], []
                out_st, out_err = [], []
                for u, (status, data, err) in zip(batch_urls, results):
                    if data is None:
                        if with_errors:
                            out_url.append(u)
                            out_no.append(0)
                            out_val.append(None)
                            out_st.append(status)
                            out_err.append(err)
                        continue
                    lines = data.decode("utf-8", "replace").splitlines()
                    if not lines and with_errors:
                        # a SUCCESSFULLY fetched empty shard must still be
                        # visible (line_no=0, status=200, no error) or a
                        # statePath consumer could never mark it done and
                        # would re-download it on every resume run
                        out_url.append(u)
                        out_no.append(0)
                        out_val.append(None)
                        out_st.append(status)
                        out_err.append(None)
                        continue
                    for i, line in enumerate(lines):
                        out_url.append(u)
                        out_no.append(i + 1)
                        out_val.append(line)
                        if with_errors:
                            out_st.append(status)
                            out_err.append(None)
                cols = {
                    "url": out_url,
                    "line_no": pd.array(out_no, dtype="int64"),
                    "value": out_val,
                }
                if with_errors:
                    cols["status"] = pd.array(out_st, dtype="int32")
                    cols["error"] = out_err
                yield pd.DataFrame(cols)

    schemas = {
        "binary": "url string, status int, content binary, error string",
        "text": "url string, status int, text string, error string",
        "lines": (
            "url string, line_no long, value string, status int, error string"
            if error_rows
            else "url string, line_no long, value string"
        ),
    }
    return manifest.mapInPandas(_fetch_batches, schemas[mode])
