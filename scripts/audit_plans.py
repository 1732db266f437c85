"""Physical-plan audit across the whole query registry.

For every registered query, builds the DataFrame at a small SF and
inspects the formatted physical plan for scale-hostile shapes:

* CartesianProduct / BroadcastNestedLoopJoin (no equi-key found);
* row-at-a-time Python UDFs (BatchEvalPython) - Arrow-batched pandas
  stages (ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas) are
  the sanctioned slow path and reported separately;
* scan counts (Location: entries / 2, formatted explain prints each
  node twice) so compositions that accidentally re-scan the fact show
  up round-over-round;
* non-atomic top-level output columns (array/map/struct) on ORACLED
  queries - the correctness driver's order-insensitive hash comparator
  cannot hash list values (pandas ``TypeError: unhashable type``), so
  an oracled query with an array output column can never get a green
  driver row even when its values are right (the r3 q_emb_pq_codebook
  failure class; the local gate stringifies arrays and misses it).

Usage: python scripts/audit_plans.py [sf_dir] [--json out.json]
Streaming and ML queries execute work at build time; they are audited
too (the plan captured is the returned frame's), which is why the
default SF is the smallest one.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smart_energy_consumption_analytics_using_big_data_spark import get_spark
from smart_energy_consumption_analytics_using_big_data_spark.plans import ORACLE, QUERIES

BAD_NODES = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")
PANDAS_NODES = ("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas")

# BroadcastNestedLoopJoin is acceptable when (and only when) the
# broadcast side is dimension/scalar-sized BY CONSTRUCTION - there is
# no equi-key to hash on and the loop side scans once. Every entry here
# must say why; any query NOT listed that plans a BNLJ fails the audit.
ALLOWED_BNLJ = {
    "q_sim_cosine_topk": "exact search: k query vectors broadcast against one corpus scan",
    "q_emb_neardup": "declared all-pairs verification baseline (production path is the LSH variant)",
    "q_emb_ivf_assign": "centroid assignment: k centroids broadcast, corpus scanned once",
    "q_sim_ann_ivf": "probe set (nprobe cells + query vectors) broadcast, lists scanned once",
    "q_text_tfidf": "scalar total-docs count cross-joined as a 1-row broadcast",
    "q_skew_audit": "scalar totals (sum + key count) cross-joined as a 1-row broadcast",
    "q_dedup_semantic": "centroid assignment: k centroids broadcast, corpus scanned once (pair stage is cell equi-join, plan-tested)",
    "q_text_logprob": "scalar corpus-token total cross-joined as a 1-row broadcast",
    "q_sample_dsir": "scalar target/raw totals cross-joined as a 1-row broadcast (ratio join itself is an equi-join)",
    "q_sim_knn_join": "bounded query batch broadcast against one corpus scan (top-k stages are windows)",
    "q_text_bm25": "1-row corpus stats (N, avgdl, per-term df) cross-joined as a broadcast",
    "q_emb_ivfpq_search": "coarse-quantizer assignment + query probe: centroid set and 1-row query broadcast, corpus scanned once per stage",
    "q_text_bpe_merges": "per merge round, the LIMIT-1 winning pair cross-joins back as a 1-row broadcast",
    "q_text_bpe_encode": "same merge iteration as q_text_bpe_merges: per round, the LIMIT-1 winning pair cross-joins back as a 1-row broadcast",
    "q_approx_overlap_kmv": "C(n_types,2)-row pair table broadcast; the OR-of-equalities membership join is bounded by the dimension-sized pair side",
    "q_text_search": "1-row corpus doc count cross-joined as a broadcast (postings join is an equi-join)",
    "q_text_pmi": "1-row unigram/bigram totals cross-joined as broadcasts (component joins are word-key equi-joins)",
    "q_ts_coincidence": "two 1-row scalar reductions (system peak, summed user peaks) meet in a 1-row cross join",
    "q_ts_kaplan_meier": "1-row global max timestamp broadcast for censoring; all other joins keyed",
    "q_drift_wasserstein": "1-row epoch bounds + 1-row totals cross-joined as broadcasts over the support-bounded step table",
    "q_ts_periodogram": "4-row literal period table broadcast against the bounded hourly rollup",
    "q_sim_ann_recall": "inherits q_sim_ann_ivf/q_sim_cosine_topk's 1-row query-vector broadcasts; the recall join itself is a 10-row equi-join",
    "q_rec_assoc_rules": "1-row distinct-order count cross-joined as a broadcast (basket and size joins are equi-joins)",
    "q_tou_peak_shift": "1-row epoch bounds cross-joined as a broadcast for the half split; everything else keyed",
    "q_seq_patterns": "1-row distinct-user count cross-joined as a broadcast (pattern join is a user-keyed equi-join)",
    "q_pvm_decomposition": "1-row shipdate bounds cross-joined as a broadcast for the half split; rollups keyed",
    "q_ts_hurst": "3-row literal scale table broadcast against the bounded hourly rollup",
    "q_ml_isotonic": "PAV minimax self-joins over the 50-row calibration bin table — bin-count-bounded, data-size-independent",
    "q_feature_quantile_norm": "1-row corpus-count cross-joined as a broadcast (the inverse-CDF lookups are integer equi-joins)",
    "q_emb_trunc_recall": "inherits q_sim_cosine_topk's 1-row query-vector broadcast, applied at three truncation widths; recall joins are 10-row equi-joins",
    "q_dedup_threshold_curve": "5-row literal threshold table broadcast against the one-pass jaccard pair table (pair build itself is the equi-join shingle machinery)",
    "q_agg_abc_pareto": "1-row total-revenue scalar cross-joined as a broadcast over the part-level rollup",
    "q_eval_qq_normal": "two 1-row broadcasts (error count for plotting positions; fit-line moment scalars) cross-joined over the Q-Q point table — the order statistics themselves ride the two-pass range-sliced row_number",
    # round-6 ranking-family migrations: with_global_ntile carries the
    # 1-row total row count as a broadcast cross join (tile arithmetic
    # needs n); the ranking itself is the range-sliced two-pass.
    "q_eval_ece": "with_global_ntile's 1-row row-count broadcast over the order-score order",
    "q_eval_gains": "with_global_ntile's 1-row row-count broadcast over the user-score order",
    "q_rfm_segment": "three with_global_ntile quartile cuts, each a 1-row row-count broadcast",
    "q_agg_gini": "1-row (n, total-cents) scalar cross-joined as a broadcast over the user rollup",
}

# Oracle OUTPUT types the driver's pandas-path hasher renders unlike
# Spark's (the r6 BPE finding): DuckDB HUGEINT — any uncast sum(BIGINT)
# — lands as float64 ('6.0' vs Spark BIGINT '6') and ALWAYS hash-fails;
# DECIMAL also lands as float64, which matches a Spark DOUBLE column but
# is a silent trap if the Spark side is integral or decimal-typed, so a
# first-appearance DECIMAL fails the audit until it's either cast in the
# oracle or allowlisted here with driver evidence.
ALLOWED_DECIMAL_ORACLE = {
    "q_mm_frames": "driver-green r2+: DECIMAL(21,1) epoch-derived frame_ts matches the Spark DOUBLE through the float64 path",
    "q_mm_audio_windows": "driver-green r2+: DECIMAL(21,1) epoch-derived start_ts matches the Spark DOUBLE through the float64 path",
}

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def oracle_type_findings(con, name: str, sql: str) -> list[str]:
    """Bind (not execute) the oracle in DuckDB and flag output columns
    whose physical rendering diverges from Spark's in the driver's
    hasher. Returns audit findings; binding errors surface too — an
    oracle that cannot even bind can never go green."""
    try:
        rel = con.sql(sql)
        cols = list(zip(rel.columns, (str(t) for t in rel.types)))
    except Exception as exc:  # noqa: BLE001 - report, don't crash the audit
        return [f"oracle bind error: {str(exc)[:160]}"]
    bad = []
    for col, typ in cols:
        if "HUGEINT" in typ:
            bad.append(f"HUGEINT oracle column {col!r} ({typ}) — CAST(... AS BIGINT)")
        elif typ.startswith("DECIMAL") and name not in ALLOWED_DECIMAL_ORACLE:
            bad.append(
                f"DECIMAL oracle column {col!r} ({typ}) — cast to DOUBLE/BIGINT "
                "or allowlist with driver evidence"
            )
    return bad


# CartesianProduct is acceptable only when a library's own blocked
# exhaustive computation plans it by design and the blocks are
# factor-sized, not data-sized. Same contract as ALLOWED_BNLJ.
ALLOWED_CARTESIAN = {
    "q_ml_als": "MLlib recommendForAllUsers: deliberate blocked cross join of user-factor x item-factor BLOCKS (rank-8 vectors, dimension-sized) for exhaustive scoring; the ANN path serves at corpus scale",
}

# A Window fed by Exchange SinglePartition executes the whole input on
# ONE task (round-5 verdict's ABC/Pareto finding, made a standing lint
# in round 6). Acceptable when (and only when) the window's input is
# SUPPORT-bounded — bins, calendar grids, value/duration histograms,
# dimension rollups — never when it scales with the data. Data-sized
# sites use the two-pass family in operators/windows.py, whose own
# bounded offsets pass (ordering on __slice, one row per slice) is
# auto-allowed by the detector. Every entry must say what bounds the
# input; any query NOT listed that plans one fails the audit.
ALLOWED_GLOBAL_WINDOW = {
    "q_drift_ks": "cumulative CDF gap over the value-BIN table (floor(value/25) support)",
    "q_drift_wasserstein": "CDF steps over the distinct-value table (~1e4 rows for 2-decimal readings, event-count-independent)",
    "q_ts_kaplan_meier": "risk-set/survival windows over the session-duration MINUTE histogram",
    "q_rollup_share": "share-of-parent over the region x nation rollup (dimension-bounded: 25 nations)",
    "q_ts_periodogram": "hourly time grid (calendar-bounded) + 4-row period table",
    "q_ml_isotonic": "PAV prefix sums over the 50-row calibration bin table",
    "q_graph_degree_dist": "complementary CDF over DISTINCT degree values (degree support, not node count)",
    "q_dq_volume_anomaly": "per-DATE ingest counts (calendar-bounded)",
    "q_ts_acf": "hourly time grid (calendar-bounded)",
    "q_dq_benford": "9-row leading-digit table",
    "q_ts_ramp_rate": "hourly time grid (calendar-bounded)",
    "q_ts_heatmap": "hour x day-of-week grid (<=168 rows)",
    "q_eval_gains": "cumulative capture over the 10-row decile table (deciles themselves cut by with_global_ntile)",
    "q_ts_hurst": "hourly grid index + per-scale window stats (64/128/256-hour windows over the calendar-bounded series)",
    "q_stat_chi2": "contingency-cell table (event_type x value-band support)",
}


_TREE_NODE = re.compile(r"^([ :+\-*]*)([A-Za-z][A-Za-z .]*\w)\s+\((\d+)\)\s*$")

# Nodes that preserve their child's partitioning: a Window reached from
# an `Exchange SinglePartition` THROUGH any chain of these still runs
# its whole input on one task.
_PARTITION_PRESERVING = {
    "Sort", "Project", "Filter", "Window", "WindowGroupLimit",
    "RunningWindowFunction", "Expand", "Generate", "SerializeFromObject",
}


def single_task_windows(plan: str) -> int:
    """Count Window nodes executing on a single partition, by walking
    the FORMATTED plan's tree: a `Window (n)` whose downstream child
    chain (through partition-preserving nodes only, any depth — the
    r6 lint's fixed 5-line lookahead missed interposed Project/Filter
    and, worse, matched the simple-plan `Window [` spelling that never
    occurs in formatted output, making it a silent no-op) reaches an
    `Exchange` whose Arguments say `SinglePartition`.

    Exemption: a Window whose ORDER spec references only `__slice` is
    the two-pass global-ranking family's offsets pass (one row per
    slice, slice-count-bounded) — checked against the node's detail
    Arguments, not a substring of the whole line, so a data-sized
    window that merely mentions __slice elsewhere is still counted."""
    lines = plan.splitlines()

    # Detail blocks: node id -> its "Arguments:" payload. ReusedExchange
    # nodes carry no Arguments; their detail HEADER names the operator
    # they alias ("(13) ReusedExchange [Reuses operator id: 8]") — map
    # them so the walk below can resolve the reused Exchange's
    # partitioning (ADVICE r8: a ReusedExchange standing in for an
    # `Exchange SinglePartition` was a lint false-negative).
    args: dict[int, str] = {}
    reuse: dict[int, int] = {}
    cur = None
    for ln in lines:
        m = re.match(r"^\((\d+)\)\s+\S", ln)
        if m:
            cur = int(m.group(1))
            r = re.match(
                r"^\((\d+)\)\s+ReusedExchange\s+\[Reuses operator id: (\d+)\]", ln
            )
            if r:
                reuse[int(r.group(1))] = int(r.group(2))
            continue
        if cur is not None and ln.startswith("Arguments: "):
            args.setdefault(cur, ln[len("Arguments: "):])

    # Tree lines (main plan + each subquery tree): (indent, name, id).
    nodes: list[tuple[int, str, int]] = []
    for ln in lines:
        m = _TREE_NODE.match(ln)
        if m:
            prefix, name, nid = m.groups()
            nodes.append((len(prefix), name.strip(), int(nid)))

    hits = 0
    for i, (ind, name, nid) in enumerate(nodes):
        if name != "Window":
            continue
        a = args.get(nid, "")
        # Window Arguments: [exprs], [partitionSpec]?, [orderSpec] —
        # take the last bracketed group as the order spec.
        order = a.rsplit("[", 1)[-1] if "[" in a else ""
        order_cols = set(re.findall(r"(\w+)#\d+", order))
        if order_cols and order_cols <= {"__slice"}:
            continue
        j = i + 1
        while j < len(nodes):
            cind, cname, cid = nodes[j]
            if cind <= ind:
                break  # left this Window's subtree
            if cname in ("Exchange", "ReusedExchange"):
                # a ReusedExchange has the same partitioning as the
                # Exchange it aliases — resolve and check that one
                if "SinglePartition" in args.get(reuse.get(cid, cid), ""):
                    hits += 1
                break
            if cname not in _PARTITION_PRESERVING:
                break  # aggregation/join/scan/stage boundary re-partitions
            j += 1
    return hits


def formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def nested_output_fields(df) -> list[str]:
    """Top-level output columns the driver's hash comparator cannot
    hash (array/map/struct). Any ORACLED query with one is un-greenable
    by construction — the q_emb_pq_codebook r3 failure class."""
    return [
        f.name for f in df.schema.fields if f.dataType.typeName() in ("array", "map", "struct")
    ]


def audit_one(name: str, df, plan: str, oracled: bool, con=None) -> dict:
    """Scale/compat findings for one query's plan + output schema."""
    bad = [node for node in BAD_NODES if node in plan]
    if oracled:
        nested = nested_output_fields(df)
        if nested:
            bad.append(f"non-atomic oracled output: {nested}")
        if con is not None:
            from smart_energy_consumption_analytics_using_big_data_spark.plans import ORACLE

            bad.extend(oracle_type_findings(con, name, ORACLE[name]))
    stw = single_task_windows(plan)
    if stw and name not in ALLOWED_GLOBAL_WINDOW:
        bad.append(f"single-task window x{stw}")
    join_only = [
        b
        for b in bad
        if b in ("BroadcastNestedLoopJoin", "CartesianProduct")
    ]
    return {
        "bad_nodes": bad,
        "allowed": bool(bad)
        and all(
            (b == "BroadcastNestedLoopJoin" and name in ALLOWED_BNLJ)
            or (b == "CartesianProduct" and name in ALLOWED_CARTESIAN)
            for b in bad
        )
        and join_only == bad,
        "pandas_stages": [node for node in PANDAS_NODES if node in plan],
        "scans": plan.count("Location: InMemoryFileIndex") // 2,
    }


def main() -> int:
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    parser.add_argument("--json", dest="json_out", default=None)
    opts = parser.parse_args()
    sf_dir, json_out = opts.sf_dir, opts.json_out

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    con = duckdb.connect()
    for tbl in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")

    report: dict[str, dict] = {}
    n_bad = 0
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as exc:  # noqa: BLE001 - audit must visit every query
            report[name] = {"error": str(exc)[:200]}
            n_bad += 1
            print(f"ERROR {name}: {str(exc)[:120]}")
            continue
        row = audit_one(name, df, plan, oracled=name in ORACLE, con=con)
        report[name] = row
        if row["bad_nodes"] and not row["allowed"]:
            n_bad += 1
            print(f"BAD   {name}: {row['bad_nodes']}")
        elif row["allowed"]:
            why = ALLOWED_BNLJ.get(name) or ALLOWED_CARTESIAN.get(name)
            print(f"allow {name}: {row['bad_nodes'][0]} ({why})")
        else:
            tag = f" pandas={row['pandas_stages']}" if row["pandas_stages"] else ""
            print(f"ok    {name}: scans={row['scans']}{tag}")

    print(f"\n== {len(report)} queries audited, {n_bad} flagged ==")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(report, fh, indent=1, sort_keys=True)
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
