#!/usr/bin/env python
"""Physical-plan audit: captures .explain("formatted") for the flagship
operators, greps the properties that matter at 100 TB (broadcast joins,
exchange reuse, pushed filters, pruned read schemas, codegen spans,
single-partition exchanges) and ASSERTS per-operator rules — a plan
regression fails the audit (and the pytest suite via tests/test_plans.py)
instead of silently going stale in PLANS.md.

Static explain shows the pre-adaptive plan; exchange REUSE is applied by
AQE at runtime, so the audit also executes selected queries and captures
the post-AQE final plan (isFinalPlan=true) where ReusedExchange is
visible.  Run standalone: python tools_plan_audit.py  (writes PLANS.md,
exits nonzero on any rule violation).
"""

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF = "/root/testdata/sf0.01"


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def final_plan(df) -> str:
    """Execute the query and return the post-AQE executed plan (the one
    with isFinalPlan=true where runtime exchange reuse is visible)."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def audit(plan: str) -> dict:
    return {
        # the queries-x-corpus cross joins broadcast via nested-loop
        "broadcast_joins": len(re.findall(
            r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan)),
        "sortmerge_joins": len(re.findall(r"SortMergeJoin", plan)),
        "shuffles": len(re.findall(
            r"Arguments: hashpartitioning|Arguments: rangepartitioning",
            plan)),
        "single_partition": len(re.findall(
            r"Exchange SinglePartition", plan)),
        "reused_exchanges": len(re.findall(r"ReusedExchange", plan)),
        "codegen_spans": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "scans": re.findall(r"ReadSchema: (.*)", plan)[:4],
        "pushed": re.findall(r"PushedFilters: (.*)", plan)[:4],
    }


def check_rules(name: str, plan: str, rules: dict) -> list:
    """Evaluate one operator's rules against its plan; returns violation
    strings (empty = clean)."""
    a = audit(plan)
    probs = []
    if a["sortmerge_joins"] > rules.get("max_sortmerge", 0):
        probs.append(f"{a['sortmerge_joins']} sort-merge joins "
                     f"(max {rules.get('max_sortmerge', 0)})")
    if a["single_partition"] > rules.get("max_single_partition", 0):
        probs.append(f"{a['single_partition']} single-partition exchanges "
                     f"(max {rules.get('max_single_partition', 0)})")
    if "max_shuffles" in rules and a["shuffles"] > rules["max_shuffles"]:
        probs.append(f"{a['shuffles']} shuffles "
                     f"(max {rules['max_shuffles']})")
    if a["broadcast_joins"] < rules.get("min_broadcast", 0):
        probs.append(f"{a['broadcast_joins']} broadcast joins "
                     f"(need >= {rules['min_broadcast']})")
    if rules.get("require_pushed"):
        pushed = [p.strip() for p in a["pushed"]
                  if p.strip() and p.strip() != "[]"]
        if not pushed:
            probs.append("no PushedFilters reached the scan")
    for token in rules.get("require", ()):
        if token not in plan:
            probs.append(f"missing {token}")
    for token in rules.get("forbid", ()):
        if token in plan:
            probs.append(f"forbidden {token} present")
    return probs


# Rules for the operators whose plans must not regress.  These are
# buildable without running the kg pipeline, so tests/test_plans.py
# asserts them on every pytest run.
def cheap_targets(spark, sf=SF):
    from pyspark.sql import functions as F  # noqa: F401

    from wikiprep_spark.operators import dedup, similarity
    from wikiprep_spark.plans import queries as Q

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    emb_q = emb.where("vec_id < 10")
    return {
        # scan+filter+agg: filter and 7-column projection must reach the
        # parquet scan; one shuffle (the final agg)
        "q1_pricing_summary": (
            Q.q1_pricing_summary(spark, sf),
            {"require_pushed": True, "max_shuffles": 1},
        ),
        # dims broadcast; the orders fact shuffles only for the final agg
        "q_join_revenue_by_nation": (
            Q.q_join_revenue_by_nation(spark, sf),
            {"min_broadcast": 2, "max_shuffles": 1},
        ),
        # single hash-shuffle on md5 keys, no text shuffled
        "dedup_exact": (
            dedup.exact_dedup(docs),
            {"max_shuffles": 1},
        ),
        # band-bucket self-join over an explicit (band,bucket) exchange
        # (AQE reuses it at runtime — see the final-plan capture)
        "dedup_minhash_lsh": (
            dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=16,
                                    threshold=0.8),
            {},
        ),
        # queries broadcast against the corpus scan
        "sim_cosine_topk": (
            similarity.cosine_topk(emb, emb_q, k=5),
            {"min_broadcast": 1},
        ),
        # banded hyperplane buckets; no global sort anywhere
        "sim_near_dup_lsh": (
            similarity.cosine_near_dup_pairs(emb, dim=64, threshold=0.95,
                                             max_bucket=10000),
            {},
        ),
        # IVF centroid bootstrap: distributed partial top-k, NOT a global
        # sort / single-partition window (the round-2 scale bug)
        "ivf_centroid_seeds": (
            similarity.ivf_centroid_seeds(emb, 16),
            {"require": ["TakeOrderedAndProject"],
             "forbid": ["Exchange SinglePartition", "Window"]},
        ),
        # IVF search: literal quantizer (no join for assignment), centroid
        # shuffle key, queries broadcast; the only sort-merge-eligible join
        # is the broadcast bucket join, so zero SMJ and no id-keyed
        # assignment join anywhere
        "sim_ivf_topk": (
            similarity.ivf_cosine_topk(emb, emb_q, k=5, n_centroids=4,
                                       n_probe=2),
            {"min_broadcast": 1},
        ),
        # one Lloyd update step: assignment inlined as a projection on the
        # vector frame — exactly one exchange (the aggregation's own), no
        # join of any kind (round 3 shuffled the corpus id-keyed here)
        "ivf_refine_step": (
            similarity.ivf_refine_step(
                emb, [(0, [1.0] * 64), (1, [-1.0] * 64)]),
            {"max_shuffles": 1, "max_sortmerge": 0,
             "forbid": ["BroadcastHashJoin", "SortMergeJoin",
                        "BatchEvalPython", "ArrowEvalPython"]},
        ),
        # pure whole-stage-codegen projection: zero shuffles, zero UDFs
        "text_quality": (
            Q.text_quality(spark, sf),
            {"max_shuffles": 0, "forbid": ["BatchEvalPython",
                                           "ArrowEvalPython"]},
        ),
        # BPE pre-tokenizer count: codegen-only projection
        "text_bpe_tokens": (
            Q.text_bpe_tokens(spark, sf),
            {"max_shuffles": 0, "forbid": ["BatchEvalPython",
                                           "ArrowEvalPython"]},
        ),
        # winnowing: rolling hashes + window minima as HOF expressions —
        # per-row compute, no shuffle, no python
        "text_winnow_fingerprints": (
            Q.text_winnow_fingerprints(spark, sf),
            {"max_shuffles": 0, "forbid": ["BatchEvalPython",
                                           "ArrowEvalPython"]},
        ),
        # Gopher repetition stats: sorted-array linear passes as HOF
        # expressions — zero shuffle, zero python
        "cur_repetition": (
            Q.cur_repetition(spark, sf),
            {"max_shuffles": 0, "forbid": ["BatchEvalPython",
                                           "ArrowEvalPython"]},
        ),
        # PII scrub: chained regexp projections — codegen only
        "cur_pii_scrub": (
            Q.cur_pii_scrub(spark, sf),
            {"max_shuffles": 0, "forbid": ["BatchEvalPython",
                                           "ArrowEvalPython"]},
        ),
        # decontamination: eval gram set must BROADCAST into a semi-join
        # (the train side is the 100 TB one); shuffles are the per-doc hit
        # agg + the dense per-doc output join only
        "cur_decontaminate": (
            Q.cur_decontaminate(spark, sf),
            {"min_broadcast": 1, "max_shuffles": 2, "max_sortmerge": 1,
             "require": ["LeftSemi"],
             "forbid": ["BatchEvalPython", "ArrowEvalPython"]},
        ),
        # deterministic sampling: pure filter-projection, zero shuffle
        "cur_sample": (
            Q.cur_sample(spark, sf),
            {"max_shuffles": 0, "forbid": ["BatchEvalPython",
                                           "ArrowEvalPython"]},
        ),
        # BM25: the isin literal prunes tokens BEFORE the tf shuffle;
        # idf/query maps broadcast back; two-phase top-k windows.
        # Shuffle budget: tf agg + df agg + score agg + 2 window
        # exchanges (AQE may coalesce); nothing corpus-wide beyond tf.
        "text_bm25_topk": (
            Q.text_bm25_topk(spark, sf),
            {"min_broadcast": 1, "max_shuffles": 6, "max_sortmerge": 0,
             "forbid": ["BatchEvalPython", "ArrowEvalPython"]},
        ),
        # as-of join: union + carry-forward window — ZERO joins of any
        # kind; shuffles are the right-side (key, ts) dedup agg plus the
        # key-partitioned window exchange
        "q_asof_attribution": (
            Q.q_asof_attribution(spark, sf),
            {"max_shuffles": 3, "max_sortmerge": 0,
             "forbid": ["BatchEvalPython", "ArrowEvalPython",
                        "BroadcastHashJoin", "ShuffledHashJoin",
                        "BroadcastNestedLoopJoin"]},
        ),
        # bloom membership: ONCE-checkpointed bits table + k broadcast
        # probe joins; nothing sort-merges, nothing funnels
        "dedup_bloom_seen": (
            Q.dedup_bloom_seen(spark, sf),
            {"max_shuffles": 0, "max_single_partition": 0,
             "min_broadcast": 4,
             "forbid": ["BatchEvalPython", "ArrowEvalPython",
                        "SortMergeJoin", "CartesianProduct"]},
        ),
        # range join via bin bucketing: MUST be an equi-join on the bin
        # (never the nested-loop product Spark compiles raw BETWEEN to)
        "q_range_ship_window": (
            Q.q_range_ship_window(spark, sf),
            {"max_shuffles": 2, "max_single_partition": 0,
             "min_broadcast": 1,
             "forbid": ["BatchEvalPython", "ArrowEvalPython",
                        "BroadcastNestedLoopJoin", "CartesianProduct"]},
        ),
        # ES weighted sample: projection + distributed partial top-k —
        # zero shuffles, the final 100 rows merge at the driver
        "cur_weighted_sample": (
            Q.cur_weighted_sample(spark, sf),
            {"max_shuffles": 0, "max_single_partition": 0,
             "require": ["TakeOrderedAndProject"],
             "forbid": ["BatchEvalPython", "ArrowEvalPython", "Join"]},
        ),
        # numeric profile: ONE grouped aggregation (decimal power sums +
        # exact percentiles ride the same agg) — no joins, no Python
        "q_profile_events": (
            Q.q_profile_events(spark, sf),
            {"max_shuffles": 1, "max_single_partition": 0,
             "forbid": ["BatchEvalPython", "ArrowEvalPython", "Join"]},
        ),
        # JSON extraction: JVM-side get_json_object + one agg
        "q_json_props": (
            Q.q_json_props(spark, sf),
            {"max_shuffles": 1, "max_single_partition": 0,
             "forbid": ["BatchEvalPython", "ArrowEvalPython", "Join"]},
        ),
        # rollup: Expand + ONE agg pass for all grouping levels
        "q_rollup_pricing": (
            Q.q_rollup_pricing(spark, sf),
            {"max_shuffles": 1, "max_single_partition": 0,
             "require": ["Expand"],
             "forbid": ["BatchEvalPython", "ArrowEvalPython", "Join"]},
        ),
        # pivot with EXPLICIT values: no distinct-discovery job, two-level
        # agg only
        "q_pivot_user_events": (
            Q.q_pivot_user_events(spark, sf),
            {"max_shuffles": 2, "max_single_partition": 0,
             "forbid": ["BatchEvalPython", "ArrowEvalPython", "Join"]},
        ),
        # HLL sketch: two map-side-combining aggs onto a <= 4096-per-
        # group register space — NOTHING may join and nothing funnels
        "sketch_hll_users": (
            Q.sketch_hll_users(spark, sf),
            {"max_shuffles": 2, "max_single_partition": 0,
             "forbid": ["BatchEvalPython", "ArrowEvalPython", "Join"]},
        ),
        # CMS: one fixed-keyspace build agg + TakeOrderedAndProject
        # top-k + broadcast-only probe joins (the sketch is <= 4096 rows)
        "sketch_cms_heavy": (
            Q.sketch_cms_heavy(spark, sf),
            {"max_shuffles": 6, "max_single_partition": 0,
             "min_broadcast": 4,
             "require": ["TakeOrderedAndProject"],
             "forbid": ["BatchEvalPython", "ArrowEvalPython",
                        "SortMergeJoin", "CartesianProduct"]},
        ),
        # SemDeDup: literal-quantizer assignment (projection, no join),
        # one cluster window + cluster-keyed pair join; seeds are a
        # bounded TakeOrderedAndProject driver pull at build time
        "sim_semantic_dedup": (
            Q.sim_semantic_dedup(spark, sf),
            {"max_shuffles": 6, "max_single_partition": 0,
             "max_sortmerge": 4,
             "forbid": ["BatchEvalPython", "ArrowEvalPython",
                        "CartesianProduct", "BroadcastNestedLoopJoin"]},
        ),
        # entity linking: HOF n-gram scan, ONCE-checkpointed
        # mention x dictionary join, doc-keyed containment self-join
        "text_entity_mentions": (
            Q.text_entity_mentions(spark, sf),
            {"max_shuffles": 5, "max_single_partition": 0,
             "max_sortmerge": 4,
             "forbid": ["BatchEvalPython", "ArrowEvalPython",
                        "CartesianProduct", "BroadcastNestedLoopJoin"]},
        ),
        # skew profile: map-side-combining count + distributed partial
        # top-k (TakeOrderedAndProject required); only the final 20 rows
        # may cross a single task (the rank window + totals broadcast)
        "q_skew_events": (
            Q.q_skew_events(spark, sf),
            {"max_shuffles": 3, "max_single_partition": 2,
             "require": ["TakeOrderedAndProject"],
             "forbid": ["BatchEvalPython", "ArrowEvalPython",
                        "SortMergeJoin"]},
        ),
        # triangle counting: HOF pair expansion (no lineitem self-join),
        # degree-ordered wedge join + closing semi-join over the ONCE-
        # checkpointed oriented edge list (deg + oriented each feed three
        # consumers); joins may sort-merge (both sides are edge-scale)
        # but nothing may cartesian, nothing funnels to one task, no
        # Python
        "graph_triangles": (
            Q.graph_triangles(spark, sf),
            {"max_shuffles": 7, "max_single_partition": 0,
             "max_sortmerge": 8,
             "forbid": ["BatchEvalPython", "ArrowEvalPython",
                        "CartesianProduct", "BroadcastNestedLoopJoin"]},
        ),
        # sliding-window chunking: pure HOF projection + posexplode —
        # nothing may shuffle, nothing may leave codegen
        "text_chunks": (
            Q.text_chunks(spark, sf),
            {"max_shuffles": 0, "max_single_partition": 0,
             "forbid": ["BatchEvalPython", "ArrowEvalPython",
                        "Exchange", "Join"]},
        ),
        # DSIR: two bucket-count aggs + two scalar totals build a
        # 4096-row log-ratio table on a complete spine; scoring is the
        # broadcast of that table onto the exploded feature stream + one
        # per-doc agg.  Single-partition exchanges are the two scalar
        # totals (1-row aggs, the lm vocab pattern) — never the stream.
        "cur_dsir": (
            Q.cur_dsir(spark, sf),
            {"max_shuffles": 8, "max_single_partition": 2,
             "min_broadcast": 1,
             "forbid": ["BatchEvalPython", "ArrowEvalPython",
                        "CartesianProduct"]},
        ),
        # duplicate-passage detection: positions stream + dup-hash set
        # meet on the 8-byte shingle hash; the island merge + span aggs +
        # doc join all share the doc_id clustering.  No pair join exists
        # anywhere (exact dedup needs no quadratic candidate step) and
        # nothing funnels to one task.
        "dedup_passages": (
            Q.dedup_passages(spark, sf),
            {"max_shuffles": 8, "max_single_partition": 0,
             "forbid": ["BatchEvalPython", "ArrowEvalPython",
                        "CartesianProduct", "BroadcastNestedLoopJoin"]},
        ),
        # sequence packing: the distributed prefix sum — range partition +
        # pid-hash window shuffle of a 2-column stream; the ONLY allowed
        # single-partition exchange is the P-row offset table (the naive
        # global-window form would funnel all N rows through one task)
        "text_pack_seqs": (
            Q.text_pack_seqs(spark, sf),
            {"max_shuffles": 4, "max_single_partition": 1,
             "min_broadcast": 1, "max_sortmerge": 0,
             "forbid": ["BatchEvalPython", "ArrowEvalPython"]},
        ),
        # bigram LM: two count aggs + scalar V on the model stream, then
        # unique-key hash joins back into the scoring stream + final
        # per-doc agg; nothing quadratic, no Python eval
        "text_lm_ppl": (
            Q.text_lm_ppl(spark, sf),
            {"max_shuffles": 8, "min_broadcast": 1,
             "forbid": ["BatchEvalPython", "ArrowEvalPython"]},
        ),
    }


def run_checks(spark, sf=SF) -> dict:
    """Build all cheap targets, evaluate rules; returns
    {name: (plan, violations)}."""
    out = {}
    for name, (df, rules) in cheap_targets(spark, sf).items():
        plan = formatted_plan(df)
        out[name] = (plan, check_rules(name, plan, rules))
    return out


def main():
    from wikiprep_spark.operators import dedup
    from wikiprep_spark.plans.queries import QUERIES
    from wikiprep_spark.plans.session import build_session

    spark = build_session(app_name="plan-audit", master="local[4]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    notes = {
        "q1_pricing_summary": "scan+filter+agg: filter and 7-column "
            "projection must reach the parquet scan",
        "q_join_revenue_by_nation": "dims must broadcast — no shuffle of "
            "the orders fact beyond the final agg",
        "kg_incoming_links": "salted two-phase count: two exchanges by "
            "design (salt phase bounds any single reducer's hub share)",
        "dedup_exact": "single hash-shuffle on md5 keys, no text shuffled",
        "dedup_minhash_lsh": "band-bucket self-join over an explicit "
            "(band,bucket) exchange; reuse shown in the post-AQE final "
            "plan below",
        "sim_cosine_topk": "queries broadcast against the corpus scan",
        "sim_near_dup_lsh": "banded hyperplane buckets, exchange reused "
            "across self-join sides",
        "ivf_centroid_seeds": "TakeOrderedAndProject (distributed partial "
            "top-k) — no global sort, no single-partition exchange",
        "sim_ivf_topk": "literal coarse quantizer, centroid-key shuffle, "
            "queries broadcast",
        "ivf_refine_step": "Lloyd update: argmin centroid inlined as a "
            "projection column — one exchange (the agg's own), no joins",
        "text_quality": "pure whole-stage-codegen projection, zero "
            "shuffles, zero UDFs",
        "text_bpe_tokens": "regexp pre-tokenizer count: codegen-only "
            "projection, zero shuffles",
        "text_winnow_fingerprints": "winnowing (k-gram rolling hash + "
            "window minima) as HOF expressions: per-row compute, zero "
            "shuffles, zero UDFs",
    }

    lines = ["# PLANS — physical-plan audit of flagship operators\n",
             "Generated by tools_plan_audit.py (re-run after plan-touching "
             "changes; also asserted by tests/test_plans.py).  Numbers are "
             'occurrences in `.explain("formatted")` at sf0.01.\n']
    failures = []
    results = run_checks(spark)
    # the kg query needs the pipeline run; audit it here (not in pytest)
    results["kg_incoming_links"] = (
        formatted_plan(QUERIES["kg_incoming_links"](spark, SF)), [])

    for name, (plan, probs) in results.items():
        a = audit(plan)
        lines.append(f"\n## {name}\n")
        lines.append(f"{notes.get(name, '')}\n")
        lines.append(
            f"- broadcast joins: {a['broadcast_joins']}, sort-merge "
            f"joins: {a['sortmerge_joins']}, shuffles: {a['shuffles']}, "
            f"single-partition exchanges: {a['single_partition']}, "
            f"codegen spans: {a['codegen_spans']}\n"
        )
        for s in a["scans"]:
            lines.append(f"- ReadSchema: `{s.strip()[:140]}`\n")
        for p in a["pushed"]:
            if p.strip() and p.strip() != "[]":
                lines.append(f"- PushedFilters: `{p.strip()[:140]}`\n")
        if probs:
            failures.append((name, probs))
            lines.append(f"- **RULE VIOLATIONS: {probs}**\n")

    # post-AQE final plan: prove runtime exchange reuse on the LSH
    # self-join (static explain can never show ReusedExchange under AQE)
    docs_small = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lsh = dedup.minhash_lsh_pairs(docs_small, num_hashes=32, bands=16,
                                  threshold=0.8)
    fp = final_plan(lsh)
    n_reused = len(re.findall(r"ReusedExchange", fp))
    lines.append("\n## post-AQE final plan: dedup_minhash_lsh (sf0.001)\n")
    lines.append(f"- isFinalPlan=true captured; ReusedExchange nodes: "
                 f"{n_reused} (the (band,bucket) exchange feeds both "
                 f"self-join sides)\n")
    if n_reused < 1:
        failures.append(("dedup_minhash_lsh_final",
                         ["no ReusedExchange in post-AQE final plan"]))

    with open("PLANS.md", "w") as fh:
        fh.writelines(lines)
    print("wrote PLANS.md")
    spark.stop()
    if failures:
        for name, probs in failures:
            print(f"PLAN RULE VIOLATION {name}: {probs}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
