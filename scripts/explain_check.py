"""Physical-plan assertions — the .explain() audit the build brief asks for.

Checks, on a real index over the tiny corpus:
 1. segment scan: shard partition pruning (PartitionFilters) + term_id
    row-group/file skipping (PushedFilters) + column pruning (no payload
    columns read when not needed)
 2. exact scorer: whole-stage codegen present; broadcast joins chosen for
    the query-terms side; partial aggregation before the shuffle
 3. postings/tokenize path: scan reads only (doc_id, text)

Run: python scripts/explain_check.py  (prints PASS/FAIL per assertion)
"""

from __future__ import annotations

import re
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from igd_spark import IndexConf, build_index, exact_bm25_topk, search
from igd_spark.corpus import assign_doc_ids, synth_transcripts
from igd_spark.session import get_spark

checks: list[tuple[str, bool, str]] = []


def check(name: str, ok: bool, detail: str = "") -> None:
    checks.append((name, ok, detail))
    print(("PASS " if ok else "FAIL ") + name + (f" — {detail}" if detail and not ok else ""))


def main() -> int:
    spark = get_spark(cores=8, shuffle_partitions=8, app="explain_check")
    conf = IndexConf(block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4)
    docs = assign_doc_ids(synth_transcripts(spark, n_convs=100, seed=3), conf).cache()
    path = tempfile.mkdtemp(prefix="igd_explain_") + "/idx"
    idx = build_index(spark, docs, path, conf=conf)
    queries = spark.createDataFrame(
        [(0, "error timeout"), (1, "t00000 t00042")], "query_id long, query_text string"
    )

    # 1. indexed search plan -------------------------------------------------
    # NOTE the assertions are deliberately strict: r2 shipped an unpruned
    # scan because the old regexes accepted `PartitionFilters: []` and
    # `PushedFilters: [IsNotNull(term_id)]` (column name present, no actual
    # predicate). Now: the partition filter must be NON-EMPTY and mention
    # shard with a membership test, and the pushed filter must be a real
    # In(term_id, ...) set test — a vacuous match cannot pass.
    def assert_pruned_scan(tag: str, plan: str) -> None:
        pf = re.search(r"PartitionFilters: \[([^\]]+)\]", plan)
        # a 1-element prune list is optimized In -> EqualTo; both are real
        # membership tests (the vacuous forms the r2 defect shipped are
        # still rejected: empty filters / bare IsNotNull never match)
        pf_ok = bool(pf) and "shard" in pf.group(1) and (
            " IN " in pf.group(1) or "IN (" in pf.group(1)
            or "in(" in pf.group(1).lower()
            or re.search(r"shard#\d+ = \d+", pf.group(1)) is not None
        )
        check(
            f"{tag}: shard partition pruning (non-empty PartitionFilters)",
            pf_ok,
            f"PartitionFilters={pf.group(1)[:120] if pf else 'ABSENT/EMPTY'}",
        )
        check(
            f"{tag}: In/EqualTo(term_id) pushed to parquet",
            "In(term_id" in plan or "EqualTo(term_id," in plan,
            "no In/EqualTo(term_id ...) in PushedFilters",
        )

    plan = search(spark, idx, queries, k=5, engine="spark")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert_pruned_scan("segment scan (createDataFrame batch)", plan)
    check(
        "query side broadcast (no shuffle of segments for the join)",
        "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan,
    )

    # 1b. the single-query path (search_one's Spark form) must prune too —
    # this is the case the r2 defect silently sent down the unpruned path
    one_q = spark.createDataFrame([(0, "error timeout")], "query_id long, query_text string")
    oplan = search(spark, idx, one_q, k=5, engine="spark")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert_pruned_scan("single-query scan", oplan)

    # 2. exact scorer plan ---------------------------------------------------
    eplan = exact_bm25_topk(docs, queries, k=5, conf=conf)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # codegen annotations only appear on the EXECUTED plan under AQE
    # (the pre-execution formatted string omits them): run it, then look
    # for the *(n) whole-stage-codegen span markers
    edf = exact_bm25_topk(docs, queries, k=5, conf=conf)
    edf.collect()
    executed = edf._jdf.queryExecution().executedPlan().toString()
    check(
        "exact scorer: whole-stage codegen",
        executed.count("*(") >= 3,
        f"codegen spans: {executed.count('*(')}",
    )
    check("exact scorer: broadcast join for query terms", "BroadcastHashJoin" in eplan)
    check(
        "exact scorer: map-side partial aggregation",
        bool(re.search(r"HashAggregate.*partial", eplan, re.IGNORECASE))
        or eplan.count("HashAggregate") >= 2,
    )

    # 3. scan column pruning on the raw-corpus path ---------------------------
    from igd_spark.tokenizer import postings

    docs_on_disk = tempfile.mkdtemp(prefix="igd_explain_corpus_") + "/t"
    docs.write.parquet(docs_on_disk)
    pplan = postings(spark.read.parquet(docs_on_disk))._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    m = re.search(r"ReadSchema: struct<([^>]*)>", pplan)
    cols = set(re.findall(r"(\w+):", m.group(1))) if m else set()
    check(
        "postings scan reads only (doc_id, text)",
        cols <= {"doc_id", "text"} and bool(cols),
        f"read {sorted(cols)}",
    )

    # 4. round-2 operators ----------------------------------------------------
    def fmt(df) -> str:
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )

    from igd_spark.pipeline import curate

    cplan = fmt(curate(spark.read.parquet(docs_on_disk)))  # docs include doc_id
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", cplan))
    check(
        "curate: single-pass (no joins, one window exchange)",
        "Join" not in cplan and n_exchanges <= 1,
        f"joins={cplan.count('Join')} exchanges={n_exchanges}",
    )

    from igd_spark.search import phrase_match

    phplan = fmt(phrase_match(spark.read.parquet(docs_on_disk),
                              spark.createDataFrame([(0, "error timeout")],
                                                    "query_id long, query_text string")))
    check(
        "phrase_match: phrase side broadcast (corpus never shuffled for the join)",
        "BroadcastHashJoin" in phplan,
    )

    # 5. persisted positional index: phrase path scans position blocks with
    # the same shard/term pruning as search — never the raw corpus
    from igd_spark import IndexConf as _IC
    from igd_spark import build_index as _bi
    from igd_spark import phrase_match_indexed

    pconf = _IC(block_size=32, n_shards=8, salt_df_threshold=64, max_salts=4,
                store_positions=True)
    ppath = tempfile.mkdtemp(prefix="igd_explain_pos_") + "/idx"
    pidx = _bi(spark, docs, ppath, conf=pconf)
    piplan = fmt(phrase_match_indexed(
        spark, pidx,
        spark.createDataFrame([(0, "error timeout")], "query_id long, query_text string"),
        engine="spark",  # the audit wants the DISTRIBUTED plan, not the driver route
    ))
    assert_pruned_scan("positional phrase scan", piplan)
    pi_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", piplan)
    check(
        "positional phrase plan never touches the corpus table",
        bool(pi_schemas) and not any("text:" in s for s in pi_schemas),
        f"scanned schemas: {pi_schemas}",
    )

    # 5b. match_phrase_prefix_indexed: same pruned positional scan, corpus
    # never read (expansion runs on the dictionary, blocks pruned to the
    # literal + expanded term set)
    from igd_spark import match_phrase_prefix_indexed

    mpplan = fmt(match_phrase_prefix_indexed(
        spark, pidx,
        spark.createDataFrame([(0, "error t0000")], "query_id long, query_text string"),
        max_expansions=4,
        engine="spark",  # the audit wants the DISTRIBUTED plan
    ))
    assert_pruned_scan("match_phrase_prefix positional scan", mpplan)
    mp_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", mpplan)
    check(
        "match_phrase_prefix_indexed plan never touches the corpus table",
        bool(mp_schemas) and not any("text:" in s for s in mp_schemas),
        f"scanned schemas: {mp_schemas}",
    )

    # 5b2. intervals_match_indexed: pruned positional scan, corpus never read
    from igd_spark import intervals_match_indexed

    ivplan = fmt(intervals_match_indexed(
        spark, pidx,
        spark.createDataFrame([(0, "error timeout")], "query_id long, query_text string"),
        max_gaps=2,
        engine="spark",  # the audit wants the DISTRIBUTED plan
    ))
    assert_pruned_scan("intervals positional scan", ivplan)
    iv_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", ivplan)
    check(
        "intervals_indexed plan never touches the corpus table",
        bool(iv_schemas) and not any("text:" in s for s in iv_schemas),
        f"scanned schemas: {iv_schemas}",
    )

    # 5b3. composite_agg_indexed: match set from pruned blocks; the docs
    # side is a NARROW (doc_id, sources...) projection — text never read
    from igd_spark import composite_agg_indexed

    docs_disk = spark.read.parquet(docs_on_disk)
    cplan = fmt(composite_agg_indexed(
        spark, idx, docs_disk, queries, sources=["role"], size=5,
    ))
    c_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", cplan)
    check(
        "composite_agg_indexed: corpus scan projects only (doc_id, sources)",
        bool(c_schemas) and not any("text:" in s for s in c_schemas),
        f"scanned schemas: {c_schemas}",
    )
    check(
        "composite_agg_indexed: bucket ranking window, no cartesian",
        "CartesianProduct" not in cplan,
    )

    # 5b4. has_child_topk_indexed: child match set from pruned blocks, the
    # parent mapping rides a narrow (doc_id, parent) projection — no text
    from igd_spark import has_child_topk_indexed
    from pyspark.sql import functions as F

    hc_parents = docs_disk.select(
        "doc_id", F.expr("doc_id div 8").alias("parent_id")
    )
    hplan = fmt(has_child_topk_indexed(
        spark, idx, queries, hc_parents, k=5, score_mode="max", round_dp=6,
    ))
    assert_pruned_scan("has_child_indexed segment scan", hplan)
    h_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", hplan)
    check(
        "has_child_indexed: corpus scan never reads text",
        bool(h_schemas) and not any("text:" in s for s in h_schemas),
        f"scanned schemas: {h_schemas}",
    )
    check(
        "has_child_indexed: no cartesian",
        "CartesianProduct" not in hplan,
    )

    # 5b5. pipeline agg over the indexed date_histogram parent: the window
    # adds NO extra scan — same number of corpus file scans as the parent
    from igd_spark import date_histogram_agg_indexed, derivative_agg

    ddocs = docs_disk.withColumn(
        "ts2",
        F.expr("timestampadd(DAY, CAST(doc_id % 4 AS INT), TIMESTAMP'2026-01-01')"),
    )
    dh_parent = date_histogram_agg_indexed(spark, idx, ddocs, queries, "ts2")
    pplan = fmt(derivative_agg(dh_parent))
    parent_scans = fmt(dh_parent).count("Scan parquet")
    check(
        "derivative over indexed date_histogram adds no scan",
        pplan.count("Scan parquet") == parent_scans,
        f"parent={parent_scans} pipeline={pplan.count('Scan parquet')}",
    )

    # 5c. resharded index: the derived-shard rewrite keeps partition pruning
    # + In(term_id) pushdown intact under the NEW shard count
    from igd_spark import reshard_index as _rs
    from igd_spark import search as _search_fn

    rpath = tempfile.mkdtemp(prefix="igd_explain_rs_") + "/idx"
    ridx = _rs(spark, ppath, rpath, n_shards=3)
    rplan = fmt(_search_fn(spark, ridx, queries, k=5, engine="spark"))
    assert_pruned_scan("resharded segment scan", rplan)

    # 6. round-3 training-prep operators ---------------------------------------
    from igd_spark import pack_sequences, remove_boilerplate, sample_stratified

    from pyspark.sql import functions as F

    docs_lang = spark.read.parquet(docs_on_disk).withColumn("lang", F.lit("en"))
    splan = fmt(sample_stratified(docs_lang, {"en": 0.5}))
    check(
        "sample_stratified: pure row filter (zero exchanges, zero joins)",
        "Exchange" not in splan and "Join" not in splan,
        f"exchanges={splan.count('Exchange')} joins={splan.count('Join')}",
    )

    pplan2 = fmt(pack_sequences(spark.read.parquet(docs_on_disk), n_shards=8))
    n_ex = len(re.findall(r"\(\d+\) Exchange", pplan2))
    check(
        "pack_sequences: one shard-hash exchange feeding the window, no joins",
        n_ex == 1 and "Join" not in pplan2 and "Window" in pplan2,
        f"exchanges={n_ex} joins={pplan2.count('Join')}",
    )

    bplan = fmt(remove_boilerplate(spark.read.parquet(docs_on_disk)))
    bschemas = re.findall(r"ReadSchema: struct<([^>]*)>", bplan)
    bcols = set()
    for s in bschemas:
        bcols |= set(re.findall(r"(\w+):", s))
    check(
        "remove_boilerplate: scans read only (doc_id, text); no broadcast of the corpus-sized span-df table",
        bcols <= {"doc_id", "text"} and bool(bcols) and "BroadcastNestedLoopJoin" not in bplan,
        f"read {sorted(bcols)}",
    )

    # 6b. exact-substring duplicate spans: join-based (never all-pairs),
    # all-JVM (no Python eval in the plan), and the removal filter is a
    # higher-order function over the token array (no token-level explode
    # feeding the final join)
    # lazy plan twins: asserting the shape must not execute the pipeline
    # (the eager wrappers persist+count; a plan script pays nothing)
    from igd_spark.dedup import _duplicate_spans_plan, _remove_duplicate_text_plan

    dup_docs = spark.read.parquet(docs_on_disk)
    dplan = fmt(_duplicate_spans_plan(dup_docs, min_len=8))
    check(
        "duplicate_spans: no cartesian, no Python eval",
        "CartesianProduct" not in dplan and "BatchEvalPython" not in dplan
        and "ArrowEvalPython" not in dplan,
    )
    rplan = fmt(_remove_duplicate_text_plan(dup_docs, min_len=8))
    check(
        "remove_duplicate_text: no cartesian, no Python eval, span filter stays a JVM lambda",
        "CartesianProduct" not in rplan and "BatchEvalPython" not in rplan
        and "ArrowEvalPython" not in rplan,
    )

    # 6c. event-stream analytics: windows only where the docstrings promise
    # them, user-keyed hash joins (never nested-loop over the stream), and
    # everything JVM-side
    from igd_spark import event_transitions, funnel_counts, retention_cohorts

    ev = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:00:00", "view"), (1, 11, "2024-01-01 00:01:00", "buy")],
        "user_id long, event_id long, ts string, event_type string",
    )
    tplan = fmt(event_transitions(ev))
    check(
        "event_transitions: window+agg only — no joins, no Python eval",
        "Join" not in tplan and "BatchEvalPython" not in tplan
        and "ArrowEvalPython" not in tplan and "Window" in tplan,
        f"joins={tplan.count('Join')}",
    )
    fplan3 = fmt(funnel_counts(ev, ["view", "buy"], window_minutes=30))
    check(
        "funnel_counts: no window over the raw stream, no cartesian",
        "Window" not in fplan3 and "CartesianProduct" not in fplan3,
    )
    n_bnlj = len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", fplan3))
    check(
        "funnel_counts: only the 1-row base denominator rides a nested-loop broadcast",
        n_bnlj <= 1 and "BatchEvalPython" not in fplan3,
        f"bnlj nodes={n_bnlj}",
    )
    rplan2 = fmt(retention_cohorts(ev))
    check(
        "retention_cohorts: keyed joins only, no window, no Python eval",
        "Window" not in rplan2 and "BroadcastNestedLoopJoin" not in rplan2
        and "CartesianProduct" not in rplan2 and "BatchEvalPython" not in rplan2,
    )

    # 7. extended query language (querylang.py) -------------------------------
    from igd_spark import bool_bm25_topk, filtered_bm25_topk, prefix_bm25_topk

    ql_docs = spark.read.parquet(docs_on_disk)
    ql_q = spark.createDataFrame(
        [(0, "error timeout")], "query_id long, query_text string"
    )

    fplan = fmt(filtered_bm25_topk(ql_docs, ql_q, "role = 'user'"))
    check(
        "filtered_bm25_topk: attribute predicate pushed to the parquet scan",
        "EqualTo(role,user)" in fplan or "EqualTo(role, user)" in fplan,
        "no EqualTo(role,...) in PushedFilters",
    )
    check(
        "filtered_bm25_topk: no cartesian product",
        "CartesianProduct" not in fplan,
    )

    bq = spark.createDataFrame(
        [(0, "error timeout", "deploy")],
        "query_id long, query_text string, exclude_text string",
    )
    bplan2 = fmt(bool_bm25_topk(ql_docs, bq, exclude_col="exclude_text"))
    check(
        "bool_bm25_topk: query/required-count sides broadcast, no cartesian",
        "BroadcastHashJoin" in bplan2 and "CartesianProduct" not in bplan2,
    )

    prplan = fmt(prefix_bm25_topk(ql_docs, ql_q))
    check(
        "prefix_bm25_topk: prefix list broadcast against the dictionary (no shuffle-side theta join)",
        "BroadcastNestedLoopJoin" in prplan and "CartesianProduct" not in prplan,
    )

    # 8. index-backed querylang: pruned block scans, never the corpus text
    from igd_spark import bool_bm25_topk_indexed, filtered_bm25_topk_indexed

    iqplan = fmt(bool_bm25_topk_indexed(spark, idx, bq, exclude_col="exclude_text", engine="spark"))
    assert_pruned_scan("bool_bm25_topk_indexed scan", iqplan)
    iq_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", iqplan)
    check(
        "bool_bm25_topk_indexed never scans the corpus text",
        bool(iq_schemas) and not any("text:" in s for s in iq_schemas),
        f"scanned schemas: {iq_schemas}",
    )

    fqplan = fmt(filtered_bm25_topk_indexed(
        spark, idx, ql_q, ql_docs, "role = 'user'"
    ))
    assert_pruned_scan("filtered_bm25_topk_indexed scan", fqplan)
    fq_m = re.findall(r"ReadSchema: struct<([^>]*)>", fqplan)
    check(
        "filtered_bm25_topk_indexed: predicate pushed; corpus read is (doc_id, role) only",
        ("EqualTo(role,user)" in fqplan or "EqualTo(role, user)" in fqplan)
        and not any("text:" in s for s in fq_m),
        f"schemas: {fq_m}",
    )

    # 9. proximity off the positional index: pruned blocks, never the corpus
    from igd_spark import near_match_indexed

    nplan = fmt(near_match_indexed(spark, pidx, ql_q, window=6, engine="spark"))
    assert_pruned_scan("near_match_indexed scan", nplan)
    np_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", nplan)
    check(
        "near_match_indexed never scans the corpus text",
        bool(np_schemas) and not any("text:" in s for s in np_schemas),
        f"scanned schemas: {np_schemas}",
    )

    # 9b. span_not off the positional index: BOTH occurrence streams
    # (include + exclusion) read pruned positional blocks; no corpus text,
    # no cartesian (the proximity window is a residual on the hash join)
    from igd_spark import span_not_match_indexed

    snplan = fmt(span_not_match_indexed(spark, pidx, ql_q, "error", pre=2, post=2, engine="spark"))
    assert_pruned_scan("span_not_match_indexed scan", snplan)
    sn_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", snplan)
    check(
        "span_not_match_indexed never scans the corpus text",
        bool(sn_schemas) and not any("text:" in s for s in sn_schemas),
        f"scanned schemas: {sn_schemas}",
    )
    check(
        "span_not_match_indexed: anti-join, no cartesian",
        "CartesianProduct" not in snplan,
    )

    # 9b. phrase_suggest: SymSpell deletes equi-join for candidates, keyed
    # hash joins against the bigram table — never a theta/nested-loop scan
    from igd_spark import phrase_suggest
    from igd_spark.stats import term_stats as _term_stats
    from igd_spark.tokenizer import postings as _postings

    ps_dict = _term_stats(_postings(ql_docs))
    psplan = fmt(phrase_suggest(ql_q, ql_docs, ps_dict))
    check(
        "phrase_suggest: no cartesian, no nested-loop join, no Python eval",
        "CartesianProduct" not in psplan
        and "BroadcastNestedLoopJoin" not in psplan
        and "BatchEvalPython" not in psplan
        and "ArrowEvalPython" not in psplan,
    )

    # 10. fuzzy / wildcard over the index: dictionary expansion still yields
    # a pruned posting-block scan, and the corpus table never appears
    from igd_spark import fuzzy_bm25_topk_indexed, wildcard_bm25_topk_indexed

    fzplan = fmt(fuzzy_bm25_topk_indexed(spark, idx, ql_q, max_edits=1))
    assert_pruned_scan("fuzzy_bm25_topk_indexed scan", fzplan)
    fz_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", fzplan)
    check(
        "fuzzy_bm25_topk_indexed never scans the corpus text",
        bool(fz_schemas) and not any("text:" in s for s in fz_schemas),
        f"scanned schemas: {fz_schemas}",
    )

    wq = spark.createDataFrame(
        [(0, "err*r tim*")], "query_id long, query_text string"
    )
    wplan = fmt(wildcard_bm25_topk_indexed(spark, idx, wq, engine="spark"))
    assert_pruned_scan("wildcard_bm25_topk_indexed scan", wplan)
    w_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", wplan)
    check(
        "wildcard_bm25_topk_indexed never scans the corpus text",
        bool(w_schemas) and not any("text:" in s for s in w_schemas),
        f"scanned schemas: {w_schemas}",
    )

    # a no-match pattern must constant-fold the segment scan away entirely
    # (In(term_id, []) -> false -> empty relation), not fall back to a full
    # unpruned read
    wq0 = spark.createDataFrame(
        [(0, "zzznomatch*")], "query_id long, query_text string"
    )
    wplan0 = fmt(wildcard_bm25_topk_indexed(spark, idx, wq0))
    seg_scans = [
        s for s in re.findall(r"Location:[^\n]*", wplan0) if "segments" in s
    ]
    check(
        "wildcard_bm25_topk_indexed: no-match expansion folds to empty (no segment scan at all)",
        not seg_scans,
        f"segment scans present: {seg_scans}",
    )

    # regexp: same expansion discipline — pruned posting scan, no corpus text
    from igd_spark.querylang import regexp_bm25_topk_indexed

    rq = spark.createDataFrame(
        [(0, "err.r|t.meout")], "query_id long, query_text string"
    )
    rplan = fmt(regexp_bm25_topk_indexed(spark, idx, rq))
    assert_pruned_scan("regexp_bm25_topk_indexed scan", rplan)
    r_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", rplan)
    check(
        "regexp_bm25_topk_indexed never scans the corpus text",
        bool(r_schemas) and not any("text:" in s for s in r_schemas),
        f"scanned schemas: {r_schemas}",
    )

    # indexed aggregations: pruned block scan for the match set, the corpus
    # appearing ONLY as a narrow attribute projection (never the text)
    from igd_spark import rescore_topk_indexed, stats_agg_indexed

    splan = fmt(stats_agg_indexed(spark, idx, docs, ql_q, "turn_idx"))
    assert_pruned_scan("stats_agg_indexed scan", splan)
    s_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", splan)
    check(
        "stats_agg_indexed reads the corpus only as (doc_id, value) — no text",
        bool(s_schemas) and not any("text:" in s for s in s_schemas),
        f"scanned schemas: {s_schemas}",
    )
    rsplan = fmt(rescore_topk_indexed(spark, idx, ql_q, window_size=10))
    assert_pruned_scan("rescore_topk_indexed scan", rsplan)
    rs_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", rsplan)
    check(
        "rescore_topk_indexed never scans the corpus text",
        bool(rs_schemas) and not any("text:" in s for s in rs_schemas),
        f"scanned schemas: {rs_schemas}",
    )

    # 10b. round-5 indexed query/agg operators: same discipline — match set
    # from pruned blocks, corpus only as narrow projections (never text)
    from igd_spark import (
        collapse_topk_indexed,
        date_histogram_agg_indexed,
        msm_bm25_topk_indexed,
        percentiles_agg_indexed,
    )
    from pyspark.sql import functions as F

    msplan = fmt(msm_bm25_topk_indexed(spark, idx, ql_q, min_should_match=2))
    assert_pruned_scan("msm_bm25_topk_indexed scan", msplan)
    ms_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", msplan)
    check(
        "msm_bm25_topk_indexed never scans the corpus text",
        bool(ms_schemas) and not any("text:" in s for s in ms_schemas),
        f"scanned schemas: {ms_schemas}",
    )
    ckeys = docs.select("doc_id", F.col("conv_id").alias("ckey"))
    cplan = fmt(collapse_topk_indexed(spark, idx, ql_q, ckeys, k=5))
    assert_pruned_scan("collapse_topk_indexed scan", cplan)
    c_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", cplan)
    check(
        "collapse_topk_indexed reads the corpus only as (doc_id, key) — no text",
        bool(c_schemas) and not any("text:" in s for s in c_schemas),
        f"scanned schemas: {c_schemas}",
    )
    pcplan = fmt(percentiles_agg_indexed(spark, idx, docs, ql_q, "turn_idx"))
    assert_pruned_scan("percentiles_agg_indexed scan", pcplan)
    pc_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", pcplan)
    check(
        "percentiles_agg_indexed never scans the corpus text",
        bool(pc_schemas) and not any("text:" in s for s in pc_schemas),
        f"scanned schemas: {pc_schemas}",
    )
    dhplan = fmt(date_histogram_agg_indexed(spark, idx, docs, ql_q, "ts"))
    assert_pruned_scan("date_histogram_agg_indexed scan", dhplan)
    dh_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", dhplan)
    check(
        "date_histogram_agg_indexed reads the corpus only as (doc_id, ts) — no text",
        bool(dh_schemas) and not any("text:" in s for s in dh_schemas),
        f"scanned schemas: {dh_schemas}",
    )

    from igd_spark import context_turns_indexed

    ctplan = fmt(context_turns_indexed(spark, idx, docs, ql_q, k=5, window=1))
    assert_pruned_scan("context_turns_indexed scan", ctplan)
    check(
        "context_turns_indexed: hit-sized sides broadcast, no cartesian",
        "BroadcastHashJoin" in ctplan and "CartesianProduct" not in ctplan,
    )

    # 11. parsed query language: one composed plan, no cartesian; the
    # indexed path stays on pruned blocks and never touches corpus text
    from igd_spark import parsed_bm25_topk, parsed_bm25_topk_indexed

    pq = [(0, '+error "error timeout" tim* dep?oy t00000~1')]
    pplan = fmt(parsed_bm25_topk(ql_docs, pq))
    check(
        "parsed_bm25_topk: composed plan has no cartesian product",
        "CartesianProduct" not in pplan,
    )
    piplan2 = fmt(parsed_bm25_topk_indexed(spark, pidx, pq))
    assert_pruned_scan("parsed_bm25_topk_indexed scan", piplan2)
    pi_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", piplan2)
    check(
        "parsed_bm25_topk_indexed never scans the corpus text",
        bool(pi_schemas) and not any("text:" in s for s in pi_schemas),
        f"scanned schemas: {pi_schemas}",
    )

    # 11b. multi-field over per-field persisted indexes: every field's
    # contribution is a pruned block scan; the corpus text never appears
    from igd_spark import build_field_indexes, multi_field_bm25_topk_indexed

    mfpath = tempfile.mkdtemp(prefix="igd_explain_mf_")
    fidx = build_field_indexes(spark, docs, mfpath, {"text": 1.0, "role": 2.0},
                               conf=conf)
    mf_q = spark.createDataFrame(
        [(0, "error user")], "query_id long, query_text string"
    )  # one body term + one role term, so BOTH field indexes are probed
    mfplan = fmt(multi_field_bm25_topk_indexed(spark, fidx, mf_q, k=5, engine="spark"))
    assert_pruned_scan("multi_field_bm25_topk_indexed scan", mfplan)
    mf_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", mfplan)
    check(
        "multi_field_bm25_topk_indexed never scans the corpus text",
        bool(mf_schemas) and not any("text:" in s for s in mf_schemas),
        f"scanned schemas: {mf_schemas}",
    )
    mf_locs = [s for s in re.findall(r"Location:[^\n]*", mfplan)
               if "segments" in s]
    check(
        "multi_field_bm25_topk_indexed: one pruned segment scan per matched field",
        len(mf_locs) >= 2,
        f"segment scans: {len(mf_locs)}",
    )
    # dis_max over the same per-field indexes: identical scan discipline
    from igd_spark import dismax_bm25_topk_indexed

    dmplan = fmt(dismax_bm25_topk_indexed(spark, fidx, mf_q, tie_breaker=0.3, k=5, engine="spark"))
    assert_pruned_scan("dismax_bm25_topk_indexed scan", dmplan)
    dm_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", dmplan)
    check(
        "dismax_bm25_topk_indexed never scans the corpus text",
        bool(dm_schemas) and not any("text:" in s for s in dm_schemas),
        f"scanned schemas: {dm_schemas}",
    )

    # a field with zero matching terms must constant-fold its scan away
    mfplan0 = fmt(multi_field_bm25_topk_indexed(spark, fidx, ql_q, k=5, engine="spark"))
    mf_locs0 = [s for s in re.findall(r"Location:[^\n]*", mfplan0)
                if "field=role" in s and "segments" in s]
    check(
        "multi_field_bm25_topk_indexed: unmatched field's segment scan folds to empty",
        not mf_locs0,
        f"role-field scans present: {mf_locs0}",
    )

    # 12. persisted embedding/ANN index (embindex.py): the probe must be a
    # partition-pruned scan of the cell/bucket dirs — never a full rescan of
    # the embedding table — with the tiny query side broadcast
    import numpy as np
    import pandas as pd

    from igd_spark import (
        build_embedding_index,
        ivf_ann_topk_indexed,
        lsh_ann_topk_indexed,
    )

    rng = np.random.RandomState(11)
    emb_pdf = pd.DataFrame(
        {
            "vec_id": np.arange(400, dtype=np.int64),
            "embedding": [list(map(float, v)) for v in rng.randn(400, 16)],
        }
    )
    emb_df = spark.createDataFrame(emb_pdf)
    epath = tempfile.mkdtemp(prefix="igd_explain_emb_") + "/eidx"
    eidx = build_embedding_index(spark, emb_df, epath, n_anchors=8)
    eq = emb_df.filter("vec_id < 3").selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )

    ivplan = fmt(ivf_ann_topk_indexed(spark, eidx, eq, k=5, nprobe=2))
    iv_pf = re.search(r"PartitionFilters: \[([^\]]+)\]", ivplan)
    check(
        "ivf_ann_topk_indexed: cell partition pruning (non-empty PartitionFilters)",
        bool(iv_pf) and "cell" in iv_pf.group(1)
        and ("IN" in iv_pf.group(1).upper() or "in(" in iv_pf.group(1).lower()),
        f"PartitionFilters={iv_pf.group(1)[:120] if iv_pf else 'ABSENT/EMPTY'}",
    )
    check(
        "ivf_ann_topk_indexed: probe side broadcast, no cartesian",
        "BroadcastHashJoin" in ivplan and "CartesianProduct" not in ivplan,
    )

    lvplan = fmt(lsh_ann_topk_indexed(spark, eidx, eq, k=5))
    lv_pf = re.search(r"PartitionFilters: \[([^\]]+)\]", lvplan)
    check(
        "lsh_ann_topk_indexed: bucket partition pruning (non-empty PartitionFilters)",
        bool(lv_pf) and "bucket" in lv_pf.group(1)
        and ("IN" in lv_pf.group(1).upper() or "in(" in lv_pf.group(1).lower()),
        f"PartitionFilters={lv_pf.group(1)[:120] if lv_pf else 'ABSENT/EMPTY'}",
    )
    check(
        "lsh_ann_topk_indexed: probe side broadcast, no cartesian",
        "BroadcastHashJoin" in lvplan and "CartesianProduct" not in lvplan,
    )

    # 12a. int8-quantized probe (ivf_q8): BOTH stages cell-pruned, and the
    # candidate scan must read the int8 codes, never the float64 vectors
    # (column pruning is the 4x IO claim)
    from igd_spark.embindex import build_quantized_layout, ivf_ann_topk_quantized

    build_quantized_layout(spark, eidx)
    qplan = fmt(ivf_ann_topk_quantized(spark, eidx, eq, k=5, oversample=3))
    q_pfs = [
        m.group(1)
        for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", qplan)
        if "cell" in m.group(1)
    ]
    check(
        "ivf_ann_topk_quantized: cell pruning on BOTH stages (2 pruned scans)",
        len(q_pfs) >= 2 and all(
            "IN" in p.upper() or "in(" in p.lower() or re.search(r"cell#\d+ = \d+", p)
            for p in q_pfs
        ),
        f"cell PartitionFilters groups={len(q_pfs)}",
    )
    q_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", qplan)
    check(
        "ivf_ann_topk_quantized: candidate scan reads q8, not ev (column pruning)",
        any("q8:" in s and "ev:" not in s for s in q_schemas),
        f"scanned schemas: {q_schemas}",
    )

    # 12b. k-gram dictionary index (kgram.py): wildcard expansion must be a
    # gbucket-partition-pruned scan of the kgrams table with the gram set
    # pushed to parquet — never a LIKE scan of the whole dictionary
    from igd_spark import build_kgram_index
    from igd_spark.kgram import _expand_patterns_kgram, _kgram_meta

    build_kgram_index(spark, idx, k=3, n_gbuckets=16)
    # the operator collects the expansion before scoring (the
    # max_expanded_terms guard), so the audit targets the expansion plan —
    # the stage where the k-gram structure replaces the dictionary scan
    kgplan = fmt(
        _expand_patterns_kgram(
            spark, idx, ["t00*2", "err*r"], _kgram_meta(idx.path)
        )
    )
    kg_pf = [
        m.group(1)
        for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", kgplan)
        if "gbucket" in m.group(1)
    ]
    check(
        "wildcard_bm25_topk_kgram: gbucket partition pruning (non-empty PartitionFilters)",
        bool(kg_pf) and any(
            "IN" in p.upper() or "in(" in p.lower() or re.search(r"gbucket#\d+ = \d+", p)
            for p in kg_pf
        ),
        f"PartitionFilters={kg_pf[:2] if kg_pf else 'ABSENT/EMPTY'}",
    )
    check(
        "wildcard_bm25_topk_kgram: In(gram) pushed to parquet",
        "In(gram" in kgplan or "EqualTo(gram," in kgplan,
        "no In/EqualTo(gram ...) in PushedFilters",
    )
    check(
        "wildcard_bm25_topk_kgram: no LIKE over the dictionary scan "
        "(all patterns prunable here)",
        "StartsWith(term" not in kgplan
        and not re.search(r"PushedFilters: \[[^\]]*Like", kgplan),
        "dictionary LIKE scan present in the kgram plan",
    )

    # 12. r5 final metric-agg tranche: the same indexed-agg discipline —
    # match set from pruned blocks, corpus only as narrow numeric
    # projections, never the text column
    from igd_spark import (
        boxplot_agg_indexed,
        extended_stats_agg_indexed,
        matrix_stats_agg_indexed,
        median_absolute_deviation_agg_indexed,
        top_metrics_agg_indexed,
    )

    docs_xy = docs.withColumn("y2", (F.col("doc_id") % 101).cast("double"))
    for label, df in (
        ("extended_stats_agg_indexed",
         extended_stats_agg_indexed(spark, idx, docs, ql_q, "turn_idx")),
        ("boxplot_agg_indexed",
         boxplot_agg_indexed(spark, idx, docs, ql_q, "turn_idx")),
        ("median_absolute_deviation_agg_indexed",
         median_absolute_deviation_agg_indexed(spark, idx, docs, ql_q, "turn_idx")),
        ("matrix_stats_agg_indexed",
         matrix_stats_agg_indexed(spark, idx, docs_xy, ql_q, "turn_idx", "y2")),
        ("top_metrics_agg_indexed",
         top_metrics_agg_indexed(spark, idx, docs_xy, ql_q, "turn_idx", "y2", k=3)),
    ):
        plan = fmt(df)
        assert_pruned_scan(f"{label} scan", plan)
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        check(
            f"{label} never scans the corpus text",
            bool(schemas) and not any("text:" in s for s in schemas),
            f"scanned schemas: {schemas}",
        )

    # 13. round-5 final tranche: scripted_metric / t_test / constant_score /
    # match_bool_prefix indexed twins keep the no-corpus-text discipline;
    # significant_text_agg_indexed legitimately re-analyzes matched docs'
    # text (the ES hits-re-analysis contract) so it only asserts pruning
    from igd_spark import (
        constant_score_topk_indexed,
        match_bool_prefix_topk_indexed,
        scripted_metric_agg_indexed,
        significant_text_agg_indexed,
        t_test_agg_indexed,
    )

    for label, df in (
        ("scripted_metric_agg_indexed",
         scripted_metric_agg_indexed(spark, idx, docs, ql_q, "turn_idx * 2",
                                     reduce="avg")),
        ("t_test_agg_indexed",
         t_test_agg_indexed(spark, idx, docs, ql_q, "turn_idx",
                            "role = 'user'", "role <> 'user'")),
        ("constant_score_topk_indexed",
         constant_score_topk_indexed(spark, idx, ql_q, boost=1.5, k=5)),
        ("match_bool_prefix_topk_indexed",
         match_bool_prefix_topk_indexed(spark, idx, ql_q, k=5)),
    ):
        plan = fmt(df)
        assert_pruned_scan(f"{label} scan", plan)
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        check(
            f"{label} never scans the corpus text",
            bool(schemas) and not any("text:" in s for s in schemas),
            f"scanned schemas: {schemas}",
        )

    stplan = fmt(significant_text_agg_indexed(spark, idx, docs, ql_q, k=5))
    assert_pruned_scan("significant_text_agg_indexed scan", stplan)

    # span_containing / span_within: ONE pruned positional enumeration
    # feeds big and little sides; the corpus is never in the plan
    from igd_spark import span_containing_match_indexed, span_within_match_indexed

    sc_q = spark.createDataFrame(
        [(0, "error timeout")], "query_id long, query_text string"
    )
    for label, df in (
        ("span_containing_match_indexed",
         span_containing_match_indexed(spark, pidx, sc_q, "the", span=6, engine="spark")),
        ("span_within_match_indexed",
         span_within_match_indexed(spark, pidx, sc_q, "the", span=6, engine="spark")),
    ):
        plan = fmt(df)
        assert_pruned_scan(f"{label} scan", plan)
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        check(
            f"{label} never scans the corpus text",
            bool(schemas) and not any("text:" in s for s in schemas),
            f"scanned schemas: {schemas}",
        )

    # round-5b tranche: exists/ids filters, span_or, value_count /
    # date_range / cumulative_cardinality indexed aggs — all must score
    # from pruned blocks; doc attributes ride narrow corpus projections
    # (never the text column); span_or reads pruned positional blocks.
    from pyspark.sql import functions as F

    from igd_spark import (
        cumulative_cardinality_agg_indexed,
        date_range_agg_indexed,
        exists_bm25_topk_indexed,
        ids_bm25_topk_indexed,
        span_or_match_indexed,
        value_count_agg_indexed,
    )

    docs_attr = docs.withColumn(
        "tool",
        F.expr("CASE WHEN doc_id % 7 = 0 THEN NULL ELSE 'tool1' END"),
    ).withColumn(
        "ts",
        F.expr(
            "timestampadd(HOUR, CAST(abs(doc_id) % 200 AS INT), "
            "TIMESTAMP'2026-01-01 00:00:00')"
        ),
    )
    explan = fmt(exists_bm25_topk_indexed(spark, idx, ql_q, docs_attr, "tool"))
    assert_pruned_scan("exists_bm25_topk_indexed scan", explan)
    ex_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", explan)
    check(
        "exists_bm25_topk_indexed never scans the corpus text",
        bool(ex_schemas) and not any("text:" in s for s in ex_schemas),
        f"scanned schemas: {ex_schemas}",
    )

    idplan = fmt(ids_bm25_topk_indexed(spark, idx, ql_q, [1, 2, 3]))
    assert_pruned_scan("ids_bm25_topk_indexed scan", idplan)
    id_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", idplan)
    check(
        "ids_bm25_topk_indexed touches no docs table at all",
        bool(id_schemas) and not any("text:" in s for s in id_schemas),
        f"scanned schemas: {id_schemas}",
    )

    vcplan = fmt(value_count_agg_indexed(spark, idx, docs_attr, ql_q, "tool"))
    assert_pruned_scan("value_count_agg_indexed scan", vcplan)
    vc_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", vcplan)
    check(
        "value_count_agg_indexed never scans the corpus text",
        bool(vc_schemas) and not any("text:" in s for s in vc_schemas),
        f"scanned schemas: {vc_schemas}",
    )

    drplan = fmt(date_range_agg_indexed(
        spark, idx, docs_attr, ql_q, "ts",
        [(None, "2026-01-05 00:00:00"), ("2026-01-05 00:00:00", None)],
    ))
    assert_pruned_scan("date_range_agg_indexed scan", drplan)
    check(
        "date_range_agg_indexed: broadcast range grid, no cartesian",
        "CartesianProduct" not in drplan,
    )

    ccplan = fmt(cumulative_cardinality_agg_indexed(
        spark, idx, docs_attr.withColumn("usr", F.expr("'u1'")),
        ql_q, "ts", "usr",
    ))
    assert_pruned_scan("cumulative_cardinality_agg_indexed scan", ccplan)
    cc_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", ccplan)
    check(
        "cumulative_cardinality_agg_indexed never scans the corpus text",
        bool(cc_schemas) and not any("text:" in s for s in cc_schemas),
        f"scanned schemas: {cc_schemas}",
    )

    soplan = fmt(span_or_match_indexed(
        spark, pidx, sc_q, "refused reset", span=6, engine="spark"
    ))
    assert_pruned_scan("span_or_match_indexed scan", soplan)
    so_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", soplan)
    check(
        "span_or_match_indexed never scans the corpus text",
        bool(so_schemas) and not any("text:" in s for s in so_schemas),
        f"scanned schemas: {so_schemas}",
    )
    check(
        "span_or_match_indexed: pair formation on hash join, no cartesian",
        "CartesianProduct" not in soplan,
    )

    # passage index: chunk-level pruned blocks + chunkmap join; the corpus
    # text is never in the plan
    from igd_spark import build_passage_index, open_passage_index, passage_bm25_topk_indexed

    ppath2 = tempfile.mkdtemp(prefix="igd_explain_pidx_") + "/pidx"
    build_passage_index(spark, docs, ppath2, chunk_tokens=16, overlap=4)
    pxidx, pxmap = open_passage_index(spark, ppath2)
    pxplan = fmt(passage_bm25_topk_indexed(spark, pxidx, pxmap, ql_q, k=5))
    assert_pruned_scan("passage_bm25_topk_indexed chunk scan", pxplan)
    px_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", pxplan)
    check(
        "passage_bm25_topk_indexed never scans the corpus text",
        bool(px_schemas) and not any("text:" in s for s in px_schemas),
        f"scanned schemas: {px_schemas}",
    )
    check(
        "passage_bm25_topk_indexed: chunkmap resolved by hash join, no cartesian",
        "CartesianProduct" not in pxplan,
    )

    # span_multi: dictionary-expanded span clause off pruned positional blocks
    from igd_spark import span_multi_match_indexed

    smplan = fmt(span_multi_match_indexed(spark, pidx, sc_q, "tim", span=6, engine="spark"))
    assert_pruned_scan("span_multi_match_indexed scan", smplan)
    sm_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", smplan)
    check(
        "span_multi_match_indexed never scans the corpus text",
        bool(sm_schemas) and not any("text:" in s for s in sm_schemas),
        f"scanned schemas: {sm_schemas}",
    )

    # round-5c tranche: variable_width_histogram rides the pruned match set
    # + a no-text value projection; frequent_item_sets re-analyzes MATCHED
    # docs only (the significant_text hits-re-analysis contract, so it
    # asserts pruning + no cartesian, not no-text).
    from igd_spark import (
        frequent_item_sets_agg_indexed,
        variable_width_histogram_agg_indexed,
    )

    vwplan = fmt(
        variable_width_histogram_agg_indexed(
            spark, idx, docs, ql_q, "turn_idx", buckets=3
        )
    )
    assert_pruned_scan("variable_width_histogram_agg_indexed scan", vwplan)
    vw_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", vwplan)
    check(
        "variable_width_histogram_agg_indexed never scans the corpus text",
        bool(vw_schemas) and not any("text:" in s for s in vw_schemas),
        f"scanned schemas: {vw_schemas}",
    )

    fiplan = fmt(
        frequent_item_sets_agg_indexed(
            spark, idx, docs, ql_q, min_support=2, k=5
        )
    )
    assert_pruned_scan("frequent_item_sets_agg_indexed scan", fiplan)
    check(
        "frequent_item_sets_agg_indexed: Apriori joins stay equi-joins, no cartesian",
        "CartesianProduct" not in fiplan,
    )

    # children / random_sampler indexed twins: parents and values ride
    # narrow no-text projections; the sampler filter is a pure hash compare
    from igd_spark import children_agg_indexed, random_sampler_agg_indexed

    chplan = fmt(
        children_agg_indexed(spark, idx, docs, ql_q, "turn_idx",
                             parent_col="conv_id")
    )
    assert_pruned_scan("children_agg_indexed scan", chplan)
    ch_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", chplan)
    check(
        "children_agg_indexed never scans the corpus text",
        bool(ch_schemas) and not any("text:" in s for s in ch_schemas),
        f"scanned schemas: {ch_schemas}",
    )

    from igd_spark import parent_agg_indexed

    paplan = fmt(
        parent_agg_indexed(
            spark, idx, docs, ql_q,
            docs.filter(F.col("turn_idx") == 0), "turn_idx",
            parent_col="conv_id",
        )
    )
    assert_pruned_scan("parent_agg_indexed scan", paplan)
    pa_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", paplan)
    check(
        "parent_agg_indexed never scans the corpus text",
        bool(pa_schemas) and not any("text:" in s for s in pa_schemas),
        f"scanned schemas: {pa_schemas}",
    )

    rsplan = fmt(
        random_sampler_agg_indexed(spark, idx, docs, ql_q, "turn_idx",
                                   probability=0.5, seed=3)
    )
    assert_pruned_scan("random_sampler_agg_indexed scan", rsplan)
    rs_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", rsplan)
    check(
        "random_sampler_agg_indexed never scans the corpus text",
        bool(rs_schemas) and not any("text:" in s for s in rs_schemas),
        f"scanned schemas: {rs_schemas}",
    )

    # proximity: BM25 from pruned posting blocks + positions from pruned
    # positional blocks — no corpus text on either side
    from igd_spark import proximity_bm25_topk_indexed

    pxbplan = fmt(
        proximity_bm25_topk_indexed(spark, pidx, ql_q, k=5, prox_weight=2.0)
    )
    assert_pruned_scan("proximity_bm25_topk_indexed scan", pxbplan)
    pxb_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", pxbplan)
    check(
        "proximity_bm25_topk_indexed never scans the corpus text",
        bool(pxb_schemas) and not any("text:" in s for s in pxb_schemas),
        f"scanned schemas: {pxb_schemas}",
    )

    # PRF: both scoring passes ride pruned blocks; the corpus text appears
    # only for the re-analyzed FEEDBACK docs (the significant_text
    # contract) — assert pruning + no cartesian
    from igd_spark import prf_bm25_topk_indexed

    prfplan = fmt(
        prf_bm25_topk_indexed(spark, idx, docs, ql_q, k=5, fb_docs=3,
                              fb_terms=3)
    )
    assert_pruned_scan("prf_bm25_topk_indexed scan", prfplan)
    check(
        "prf_bm25_topk_indexed: no cartesian product",
        "CartesianProduct" not in prfplan,
    )

    # alternative similarities: every indexed twin rides the same pruned
    # block enumeration — shard partition pruning + In(term_id) pushdown,
    # corpus text never scanned
    from igd_spark import (
        axiomatic_topk_indexed,
        dfi_topk_indexed,
        dfr_pl2_topk_indexed,
        ib_ll_topk_indexed,
    )

    for simtag, simfn in (
        ("dfi_topk_indexed", lambda: dfi_topk_indexed(
            spark, idx, ql_q, k=5, engine="spark")),
        ("dfr_pl2_topk_indexed", lambda: dfr_pl2_topk_indexed(
            spark, idx, ql_q, c=1.0, k=5, engine="spark")),
        ("ib_ll_topk_indexed", lambda: ib_ll_topk_indexed(
            spark, idx, ql_q, c=1.0, k=5, engine="spark")),
        ("axiomatic_f2exp_topk_indexed", lambda: axiomatic_topk_indexed(
            spark, idx, ql_q, variant="f2exp", k=5, engine="spark")),
        ("axiomatic_f2log_topk_indexed", lambda: axiomatic_topk_indexed(
            spark, idx, ql_q, variant="f2log", k=5, engine="spark")),
        ("bm25_plus_topk_indexed", lambda: __import__("igd_spark").bm25_variant_topk_indexed(
            spark, idx, ql_q, variant="plus", k=5, engine="spark")),
        ("bm25_l_topk_indexed", lambda: __import__("igd_spark").bm25_variant_topk_indexed(
            spark, idx, ql_q, variant="l", k=5, engine="spark")),
    ):
        simplan = fmt(simfn())
        assert_pruned_scan(f"{simtag} scan", simplan)
        sim_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", simplan)
        check(
            f"{simtag} never scans the corpus text",
            bool(sim_schemas) and not any("text:" in s for s in sim_schemas),
            f"scanned schemas: {sim_schemas}",
        )

    # terms_enum_indexed: dictionary-sidecar-only — no posting blocks, no
    # corpus text; the prefix set is broadcast against the vocab
    te_q = spark.createDataFrame(
        [(0, "t", None)], "query_id long, query_text string, after_term string"
    )
    te_plan = fmt(
        __import__("igd_spark").terms_enum_indexed(
            spark, idx, te_q, size=5, after_col="after_term"
        )
    )
    te_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", te_plan)
    check(
        "terms_enum_indexed reads only the dictionary (no text, no blocks)",
        bool(te_schemas)
        and not any("text:" in s or "postings:" in s or "block" in s for s in te_schemas),
        f"scanned schemas: {te_schemas}",
    )
    check(
        "terms_enum_indexed broadcasts the prefix set",
        "BroadcastExchange" in te_plan or "BroadcastNestedLoopJoin" in te_plan,
        "no broadcast in plan",
    )

    # field_caps: ONE aggregate pass (a single multi-count row unpivoted by
    # explode) — exactly one scan of the docs source in the plan
    fc_plan = fmt(__import__("igd_spark").field_caps(docs))
    # ONE pass = one partial+final aggregate pair over one source (the
    # broken per-field-union shape would repeat the whole chain N times);
    # a cached source legitimately shows InMemoryTableScan + its nested
    # provider, so count exchanges/aggregates, not raw scan nodes
    n_exch = len(re.findall(r"\(\d+\) Exchange", fc_plan))
    n_aggs = len(re.findall(r"\(\d+\) HashAggregate", fc_plan))
    n_unions = len(re.findall(r"\(\d+\) Union", fc_plan))
    check(
        "field_caps is one corpus pass (one agg pair, no union)",
        n_exch == 1 and n_aggs == 2 and n_unions == 0,
        f"{n_exch} exchanges, {n_aggs} aggregates, {n_unions} unions",
    )

    n_fail = sum(1 for _, ok, _ in checks if not ok)
    print(f"\n{len(checks) - n_fail}/{len(checks)} plan checks passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
