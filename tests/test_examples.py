"""Golden tests for the three reference example configs rebuilt on fixtures
(SURVEY §5 — the reference's only executable specifications), plus the
curation example exercising the extended operator surface."""

from __future__ import annotations

import gzip
import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from orientdb_etl_spark import Pipeline

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def _load(name: str) -> dict:
    with open(EXAMPLES / name) as f:
        return json.load(f)


def test_config_csv_example(spark, tmp_path):
    src = tmp_path / "test.csv"
    src.write_text(
        "1;2020-01-01;a;w;s1; keep ;2021-01-01\n"
        "2;2020-02-01;b;x;s2;;2021-02-01\n"
        "3;2020-03-01;c;y;s3; also ;2021-03-01\n"
    )
    cfg = _load("config-csv.json")
    p = Pipeline(
        cfg,
        spark=spark,
        variables={"inputPath": str(src), "outputPath": str(tmp_path / "out")},
    )
    res = p.run()
    out = spark.read.parquet(str(tmp_path / "out" / "documents"))
    rows = {r.id: r for r in out.collect()}
    # row 2 has empty dontknow → from_csv yields null → flow-skip drops it
    assert set(rows) == {1, 3}
    assert rows[1].dontknow == "keep" and rows[3].dontknow == "also"
    assert rows[1].time is not None  # sysdate()
    assert res.stats.errors == 0


def test_config_dbpedia_example(spark, tmp_path):
    stage = Path("/tmp/oetl_examples")
    stage.mkdir(exist_ok=True)
    with gzip.open(stage / "Person.csv.gz", "wt") as f:
        f.write(
            "junk line 1,x,0\n"
            "junk line 2,x,0\n"
            "junk line 3,x,0\n"
            "http://dbpedia.org/resource/Alice,Alice,30\n"
            "http://dbpedia.org/resource/Bob,NULL,41\n"
            "http://dbpedia.org/resource/Carol,Carol,NULL\n"
        )
    # pre-existing V dimension: Alice already loaded with an extra field
    existing = spark.createDataFrame(
        [("http://dbpedia.org/resource/Alice", "earlier-run")],
        "URI string, origin string",
    )
    cfg = _load("config-dbpedia.json")
    p = Pipeline(
        cfg, spark=spark, variables={"outputPath": str(tmp_path / "graph")}
    )
    p.register_table("V", existing)
    res = p.run()
    # begin-let shim: $fileDirectory.append($fileName), substring/indexOf
    assert p.ctx.variables["filePath"] == "/tmp/oetl_examples/Person.csv.gz"
    assert p.ctx.variables["className"] == "Person"
    verts = spark.read.parquet(str(tmp_path / "graph" / "vertices"))
    got = {r.id: r for r in verts.collect()}
    assert len(got) == 3  # skip window dropped the 3 junk lines
    assert all(r.label == "Person" for r in got.values())
    docs = spark.read.parquet(str(tmp_path / "graph" / "documents"))
    alice = docs.filter(F.col("URI").contains("Alice")).first()
    # merge carried the existing record's field over (ODocument.merge)
    assert alice.origin == "earlier-run" and alice.age == 30
    bob = docs.filter(F.col("URI").contains("Bob")).first()
    assert bob.name is None  # nullValue sentinel honored


def test_config_curation_example(spark):
    """The extended-surface example: metrics → best-of-cluster minhash
    dedup → quality filter, all through the config pipeline."""
    cfg = _load("config-curation.json")
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog tonight again"),
            (1, "the quick brown fox jumps over the lazy dog tonight again"),
            (2, "!!!! ???? ...."),  # low quality → filtered
            (3, "a completely different document about spark and its query engine"),
        ],
        "doc_id long, text string",
    )
    p = Pipeline(cfg, spark=spark)
    p.register_table("documents", docs)
    res = p.run().outputs["curated"]
    assert set(res.columns) == {"doc_id", "n_tokens", "quality", "lang_pred"}
    ids = sorted(r.doc_id for r in res.collect())
    assert 3 in ids  # distinct doc kept
    assert len([i for i in ids if i in (0, 1)]) == 1  # dup cluster → one kept
    assert 2 not in ids  # junk filtered by quality floor


def test_config_jdbc_example_shape(spark, tmp_path):
    """No MySQL in the container: swap the jdbc extractor for a registered
    table and verify the rest of the pipeline (vertex → graph load)."""
    cfg = _load("config-jdbc.json")
    assert cfg["extractor"]["jdbc"]["query"] == "select * from Client"
    cfg["extractor"] = {"table": {"name": "Client"}}
    clients = spark.createDataFrame(
        [(1, "acme"), (2, "globex")], "id int, name string"
    )
    p = Pipeline(
        cfg, spark=spark, variables={"outputPath": str(tmp_path / "jgraph")}
    )
    p.register_table("Client", clients)
    p.run()
    verts = spark.read.parquet(str(tmp_path / "jgraph" / "vertices"))
    assert verts.count() == 2
    assert set(r.label for r in verts.collect()) == {"Client"}


def test_config_graph_example(spark):
    """Graph example: pagerank + topk through the config pipeline, checked
    against the direct function call on the same edge frame."""
    from orientdb_etl_spark.functions.graph import pagerank

    cfg = _load("config-graph.json")
    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (10, 1), (1, 2), (2, 1)],
        "src long, dst long",
    )
    p = Pipeline(cfg, spark=spark)
    p.register_table("ships_to", edges)
    got = [(r.id, r.rank) for r in p.run().outputs["influencers"].collect()]
    want = {
        r.id: r.rank for r in pagerank(edges, iterations=5).collect()
    }
    assert len(got) == len(want) <= 10
    # descending by rank, ties broken by id, values exactly the direct call's
    assert got == sorted(
        ((i, want[i]) for i in want), key=lambda t: (-t[1], t[0])
    )


def test_config_pretrain_data_example(spark):
    """The full pretraining-data build from JSON config: clean → quality
    gate → near-dedup → decontaminate → split → token budget → pack."""
    import json

    from orientdb_etl_spark import Pipeline

    cfg = json.load(open(f"{EXAMPLES}/config-pretrain-data.json"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    eval_df = spark.createDataFrame(
        [(0, "this eval phrase does not appear in the corpus at all")],
        "eid long, text string",
    )
    p = Pipeline(cfg, spark=spark)
    p.register_table("documents", docs)
    p.register_table("eval_docs", eval_df)
    out = p.run().outputs["pretrain_batches"]
    rows = out.collect()
    assert len(rows) > 0
    assert {"doc_id", "pack_id", "pack_tokens"} <= set(out.columns)
    assert all(r.pack_tokens <= 512 for r in rows)
    # packs are dense: every pack holds at least one doc, ids unique
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))


def test_config_manifest_ingest_example(spark, tmp_path):
    """Golden test for the manifest-ingest + merge-sink example: three
    shard files listed in a manifest, fetched distributed, parsed,
    merged idempotently (second run with an overlapping shard replaces
    exactly its keys), with observed metrics on the sink action."""
    from orientdb_etl_spark.listeners import CollectingListener

    shards = []
    for i in range(3):
        p = tmp_path / f"part-{i}.csv"
        p.write_text("".join(
            f"{i * 10 + j};name{i}_{j};{(i * 10 + j) * 1.5}\n" for j in range(4)
        ))
        shards.append(str(p))
    manifest = tmp_path / "manifest.txt"
    manifest.write_text("# shards\n" + "\n".join(shards) + "\n")
    out = tmp_path / "merged"

    cfg = _load("config-manifest-ingest.json")
    col = CollectingListener()
    varz = {"manifestPath": str(manifest), "outputPath": str(out)}
    Pipeline(cfg, spark=spark, variables=varz, listener=col.listener()).run()
    first = {r.id: (r.name, r.amount) for r in spark.read.parquet(str(out))
             .select("id", "name", "amount").collect()}
    assert len(first) == 12
    assert first[23] == ("name2_3", 34.5)
    assert any(e.startswith("metrics ") and "n_ids=12" in e for e in col.events)

    # idempotent re-run with one rewritten shard: keys 20..23 replaced
    (tmp_path / "part-2.csv").write_text(
        "".join(f"{20 + j};NEW_{j};{0.0}\n" for j in range(4))
    )
    Pipeline(cfg, spark=spark, variables=varz).run()
    final = {r.id: (r.name, r.amount) for r in spark.read.parquet(str(out))
             .select("id", "name", "amount").collect()}
    assert len(final) == 12
    assert final[23] == ("NEW_3", 0.0)
    assert final[3] == first[3]  # untouched shard's keys unchanged


def test_config_manifest_resume_example(spark, tmp_path):
    """Golden test for the resumable-manifest example: run 1 fetches all
    shards (one poisoned URL dead-letters) and the pipeline itself
    records the successes after the sink commit (recordState: true);
    run 2 over a GROWN manifest fetches only the new shard plus the
    retrying dead-letter — while the merge sink keeps every previously
    ingested key."""
    shards = []
    for i in range(3):
        p = tmp_path / f"blob-{i}.bin"
        p.write_bytes(bytes([i]) * (10 + i))
        shards.append(str(p))
    bad = str(tmp_path / "missing.bin")
    manifest = tmp_path / "manifest.txt"
    manifest.write_text("\n".join(shards + [bad]) + "\n")
    out, state = tmp_path / "merged", tmp_path / "state"
    varz = {
        "manifestPath": str(manifest),
        "statePath": str(state),
        "outputPath": str(out),
    }
    cfg = _load("config-manifest-resume.json")
    r1 = Pipeline(cfg, spark=spark, variables=varz).run()
    sink1 = spark.read.parquet(str(out))
    assert sink1.count() == 4  # 3 good + 1 dead-letter row
    # recordState wrote the success set (dead-letter excluded) itself
    assert any("manifest state recorded: 3" in n for n in r1.stats.notes)
    assert spark.read.parquet(str(state)).distinct().count() == 3

    # grow the manifest by one shard; re-run fetches ONLY delta + retry
    extra = tmp_path / "blob-3.bin"
    extra.write_bytes(b"\x03" * 13)
    manifest.write_text("\n".join(shards + [bad, str(extra)]) + "\n")
    r2 = Pipeline(cfg, spark=spark, variables=varz).run()
    assert r2.stats.rows_loaded == 2  # new shard + dead-letter retry only
    final = {r.url: r for r in spark.read.parquet(str(out)).collect()}
    assert len(final) == 5
    assert final[shards[0]].n_bytes == 10  # run-1 rows kept by the merge
    assert final[str(extra)].n_bytes == 13
    assert final[bad].status == -1 and not final[bad].ok


def test_config_incremental_dedup_transformer(spark):
    """Cross-snapshot dedup as a config transformer: seenTable resolves
    from the registered-table namespace; exact fingerprint match AND
    MinHash near-match against the curated corpus both drop."""
    from orientdb_etl_spark import Pipeline

    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest before nightfall arrives"
    )
    seen = spark.createDataFrame([(0, base)], "doc_id long, text string")
    new = spark.createDataFrame(
        [
            (1, base),            # exact (canonical) match -> exact stage
            (2, base + " truly"),  # near match -> minhash stage
            (3, "fresh content about catalyst optimizer rule ordering"),
        ],
        "doc_id long, text string",
    )
    p = Pipeline(
        {
            "extractor": {"table": {"name": "new_crawl"}},
            "transformers": [
                {"dedup": {"method": "incremental", "seenTable": "curated",
                           "idField": "doc_id", "nearThreshold": 0.6}},
            ],
            "loader": {"memory": {"view": "out"}},
        },
        spark=spark,
    )
    p.register_table("new_crawl", new)
    p.register_table("curated", seen)
    out = p.run().outputs["out"]
    assert [r.doc_id for r in out.collect()] == [3]


def test_config_incremental_crawl_example(spark, tmp_path):
    """The continuous-crawl build: cross-snapshot exact+near dedup vs the
    registered curated table, within-snapshot staged dedup, then a
    Z-ordered parquet write — all from the JSON config."""
    import glob

    from orientdb_etl_spark import Pipeline

    cfg = _load("config-incremental-crawl.json")
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest before nightfall arrives"
    )
    curated = spark.createDataFrame([(0, base)], "doc_id long, text string")
    new = spark.createDataFrame(
        [
            (10, base),                    # exact cross-snapshot dup
            (11, base + " truly"),         # near cross-snapshot dup
            (12, "fresh doc about adaptive query execution in spark"),
            (13, "fresh doc about adaptive query execution in spark"),  # within-new exact dup
            (14, "another unrelated document covering broadcast joins"),
        ],
        "doc_id long, text string",
    )
    out = str(tmp_path / "crawl")
    p = Pipeline(cfg, spark=spark, variables={"outputPath": out})
    p.register_table("new_crawl", new)
    p.register_table("curated", curated)
    p.run()
    back = spark.read.parquet(out)
    ids = sorted(r.doc_id for r in back.collect())
    # 10 dropped (exact vs seen), 11 dropped (near vs seen), 13 dropped
    # (exact within new, keeper = min id 12), 12 + 14 survive
    assert ids == [12, 14]
    assert "zkey" not in back.columns
    # 2 surviving rows can fill at most 2 of the 4 requested range
    # partitions; empty partitions write no file
    assert 1 <= len(glob.glob(f"{out}/part-*.parquet")) <= 4


def test_config_web_rebalance_example(spark):
    """Crawl rebalancing from JSON config: htmlExtract → normalize → C4
    → temperature mixture → weighted final draw."""
    import json

    from pyspark.sql import functions as F

    from orientdb_etl_spark import Pipeline

    cfg = json.load(open(f"{EXAMPLES}/config-web-rebalance.json"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = docs.withColumn(
        "html",
        F.concat(
            F.lit("<html><body><script>var x=1;</script><p>"),
            F.col("text"),
            F.lit("</p></body></html>"),
        ),
    )
    p = Pipeline(cfg, spark=spark)
    p.register_table("pages", pages)
    out = p.run().outputs["web_rebalanced"]
    rows = out.collect()
    assert 0 < len(rows) <= 200
    # extraction really ran: no tags or script bodies survive
    assert all("<" not in r.text and "var x=1" not in r.text for r in rows)
    # deterministic: second run yields the identical id set
    p2 = Pipeline(cfg, spark=spark)
    p2.register_table("pages", pages)
    ids2 = {r.doc_id for r in p2.run().outputs["web_rebalanced"].collect()}
    assert {r.doc_id for r in rows} == ids2


def test_config_warehouse_analytics_example(spark):
    """standardize → rollingAgg → scd2 chained from JSON config: the
    history output carries validity intervals with exactly one open row
    per user, and the intermediate columns flowed through."""
    import json

    from orientdb_etl_spark import Pipeline

    cfg = json.load(open(f"{EXAMPLES}/config-warehouse-analytics.json"))
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p = Pipeline(cfg, spark=spark)
    p.register_table("events", ev)
    out = p.run().outputs["user_history"]
    rows = out.collect()
    assert {"user_id", "event_type", "valid_from", "valid_to"} <= set(out.columns)
    n_users = ev.select("user_id").distinct().count()
    open_rows = [r for r in rows if r.valid_to is None]
    assert len(open_rows) == n_users  # exactly one current version each
    # intervals are well-formed
    assert all(r.valid_to is None or r.valid_to > r.valid_from for r in rows)


def test_config_lifecycle_analytics_example(spark):
    """growthAccounting + windowFunnel on side branches (output
    attribute), collapseRuns on the main lineage — three behavioral
    summaries from one config over one events frame."""
    import json

    from orientdb_etl_spark import Pipeline

    cfg = json.load(open(f"{EXAMPLES}/config-lifecycle-analytics.json"))
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p = Pipeline(cfg, spark=spark)
    p.register_table("events", ev)
    res = p.run()
    runs = res.outputs["state_runs"]
    assert {"user_id", "event_type", "start_es", "end_es", "n_events"} <= set(
        runs.columns
    )
    # runs never exceed the raw event count and compress repeats
    assert runs.count() <= ev.count()
    growth = res.outputs["growth"].collect()
    assert all(
        r.active == r.new_users + r.retained + r.resurrected for r in growth
    )
    funnel = res.outputs["funnel"].collect()[0]
    assert funnel.n1_view >= funnel.n2_click >= funnel.n3_purchase


def test_config_preflight_governance_example(spark):
    """Pre-flight + governance config: key skew, join-cardinality
    estimate, contribution analysis, and the expectations gate all on
    output side branches; the gated frame passes through unchanged."""
    import json

    from orientdb_etl_spark import Pipeline
    from pyspark.sql import functions as F

    cfg = json.load(open(f"{EXAMPLES}/config-preflight-governance.json"))
    sf = "/root/testdata/sf0.001"
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    customer = spark.read.parquet(f"{sf}/customer.parquet")
    cur = orders.where(F.year("o_orderdate") >= 1998)
    prev = orders.where(F.year("o_orderdate") < 1998)
    p = (
        Pipeline(cfg, spark=spark)
        .register_table("orders", cur)
        .register_table("orders_prev", prev)
        .register_table("customer", customer)
    )
    res = p.run()
    # main lineage untouched by the audit side branches
    assert res.outputs["gated_orders"].count() == cur.count()
    skew = res.outputs["skew"].collect()
    assert skew and all(r.suggested_salt >= 1 for r in skew)
    fanout = res.outputs["fanout"].collect()
    # orders->customer is many-to-one: est pairs == matching order rows
    n_match = cur.join(
        customer, cur["o_custkey"] == customer["c_custkey"]
    ).count()
    assert fanout[0]["est_total_pairs"] == n_match
    moves = res.outputs["moves"].collect()
    dims = {r["dimension"] for r in moves}
    assert dims == {"o_orderpriority", "o_orderstatus"}
    dq = {r["constraint"]: r for r in res.outputs["dq"].collect()}
    assert all(r["passed"] for r in dq.values())


def test_example_document_search(spark):
    import json

    cfg = json.load(open(f"{EXAMPLES}/config-document-search.json"))
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    snips = docs.limit(20).select(
        F.col("doc_id").alias("snip_id"),
        F.array_join(
            F.slice(F.split(F.lower(F.trim("text")), r"\s+"), 1, 12), " "
        ).alias("snip"),
    )
    p = (
        Pipeline(cfg, spark=spark)
        .register_table("snippets", snips)
        .register_table("docs", docs)
    )
    res = p.run()
    hits = res.outputs["excerpt_hits"]
    # every snippet is fully contained in (at least) its source document
    self_pairs = {
        (r.left_id, r.right_id)
        for r in hits.where(F.col("left_id") == F.col("right_id")).collect()
    }
    assert len(self_pairs) == 20
    ph = res.outputs["phrase_hits"].collect()
    assert all(r.n_hits >= 1 for r in ph)


def test_config_span_dedup_report_example(spark):
    cfg = _load("config-span-dedup-report.json")
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    res = Pipeline(cfg, spark=spark).register_table("docs", docs).run()
    # side branch 2: per-doc duplicated-passage profile (passages module;
    # docs shorter than n produce no row, by its documented contract)
    rows = res.outputs["dup_exposure"].collect()
    assert rows and all(0.0 <= r.dup_frac <= 1.0 for r in rows)
    for r in rows:
        assert r.n_dup_grams <= r.n_grams
    # side branch 1: the winnowed pair stream
    pairs = res.outputs["span_pairs"]
    assert set(pairs.columns) == {"id_a", "id_b", "shared_windows"}
    # main lineage: the remediated corpus (all-but-one removal) — every
    # non-empty doc survives with bounded removal, and corpus-wide removal
    # is positive iff the profile saw any duplication
    cleaned = {r.doc_id: r for r in res.outputs["deduped_corpus"].collect()}
    exp = {r.doc_id: r for r in rows}
    for did, c in cleaned.items():
        assert 0 <= c.removed_tokens <= c.n_toks
        if did in exp and exp[did].n_dup_grams == 0:
            assert c.removed_tokens == 0
    total_exposed = sum(r.n_dup_grams for r in rows)
    total_removed = sum(c.removed_tokens for c in cleaned.values())
    assert (total_removed > 0) == (total_exposed > 0)


def test_config_corpus_audit_example(spark):
    """Corpus-audit config: Heaps growth, OOV rate, span-corruption
    mask audit, and the AMS F2 sketch all ride output side branches;
    the main lineage carries readability-scored docs through."""
    import json

    from orientdb_etl_spark import Pipeline

    cfg = json.load(open(f"{EXAMPLES}/config-corpus-audit.json"))
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    res = Pipeline(cfg, spark=spark).register_table("documents", docs).run()
    n_docs = docs.count()
    main = res.outputs["scored_docs"]
    assert main.count() == n_docs
    assert "readability" in main.columns
    growth = res.outputs["vocab_growth"].collect()[0]
    assert growth.n_docs == n_docs and growth.vocab > 0
    # the synthetic fixture vocabulary saturates immediately
    assert growth.heaps_beta < 0.2
    oov = res.outputs["oov_audit"]
    assert oov.count() == n_docs
    mask = res.outputs["mask_audit"]
    stats = mask.agg({"mask_frac": "max", "n_spans": "min"}).collect()[0]
    assert stats[0] is None or stats[0] <= 0.15 + 1e-9
    f2 = res.outputs["key_skew_sketch"].collect()[0]
    # doc_id is unique -> exact F2 == row count (no skew mass)
    assert f2.exact_f2 == n_docs


def test_config_experiment_readout_example(spark):
    """Experiment-readout config: SRM guardrail, Welch, DiD, stratified
    ATE, and Wasserstein all on output branches over derived arm/period
    columns; the main lineage passes the derived frame through."""
    import json

    from orientdb_etl_spark import Pipeline

    cfg = json.load(open(f"{EXAMPLES}/config-experiment-readout.json"))
    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    res = Pipeline(cfg, spark=spark).register_table("events", events).run()
    main = res.outputs["experiment_events"]
    clean = events.where(
        "user_id IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL"
    ).count()
    assert main.count() == clean
    assert {"arm", "treat", "post"} <= set(main.columns)
    srm = {r.arm: r for r in res.outputs["srm"].collect()}
    assert set(srm) == {"treatment", "control"}
    assert sum(r.n for r in srm.values()) == clean
    w = res.outputs["welch"].collect()[0]
    assert w.n_a > 0 and w.n_b > 0
    did = res.outputs["did"].collect()[0]
    assert did.did is not None
    ate = res.outputs["ate"].collect()[0]
    assert ate.n_used_strata == 5
    w1 = res.outputs["w1"].collect()[0]
    assert w1.w1 is not None and w1.w1 >= 0


def test_config_quality_filter_example(spark):
    """The fastText + CCNet quality recipe from JSON config: classifier
    keep-gate -> KN perplexity buckets (fixed cutoffs) -> drop tail."""
    import json

    from pyspark.sql import functions as F

    from orientdb_etl_spark import Pipeline

    cfg = json.load(open(f"{EXAMPLES}/config-quality-filter.json"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    seed = docs.filter(F.col("doc_id") % 2 == 0).withColumn(
        "label", (F.col("lang") == "en").cast("int")
    )
    ref = docs.filter(F.col("source") == "src0")
    p = Pipeline(cfg, spark=spark)
    p.register_table("documents", docs)
    p.register_table("seed_docs", seed)
    p.register_table("reference_docs", ref)
    out = p.run().outputs["quality_filtered"]
    rows = out.collect()
    assert {"doc_id", "ppl", "bucket"} <= set(out.columns)
    assert len(rows) > 0
    assert all(r.bucket in ("head", "middle") for r in rows)
    assert all(
        (r.ppl <= 37.0) == (r.bucket == "head") for r in rows
    )


def test_config_mixture_planning_example(spark):
    """DoReMi from JSON config: label via field-if expression, Group-DRO
    over the source domains, simplex alpha out."""
    import json

    from orientdb_etl_spark import Pipeline

    cfg = json.load(open(f"{EXAMPLES}/config-mixture-planning.json"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = Pipeline(cfg, spark=spark)
    p.register_table("documents", docs)
    out = p.run().outputs["domain_mixture"]
    rows = out.collect()
    assert set(out.columns) == {
        "source", "n_docs", "excess_last", "alpha_final", "alpha"
    }
    n_src = docs.select("source").distinct().count()
    assert len(rows) == n_src
    assert abs(sum(r.alpha for r in rows) - 1.0) < 1e-4
    assert all(r.excess_last >= 0 for r in rows)
