"""Pin the driver-window invariant.

The correctness driver checks only the first 50 entries of ``queries()``
in dict order (round 1 evidence: CORRECTNESS_r01.json is exactly the
first 50 registrations). Rounds 1-7 used the window to close the
attestation ledger: CORRECTNESS_r01-07 give every operator class a
driver row (273 hash-green + 3 rows-only-by-design + X137 red).

Round 8 (r7 verdict items 1/4/7) re-purposes the window:

* FORCED      — the X137 channel probe: the thrice-red original plus a
                BYTE-IDENTICAL twin under a new name. Green twin + red
                original proves stale per-name driver state.
* CHANGED_R8  — queries whose bodies/plans changed this round and must
                be re-attested (ADVICE division fixes, binseg guard,
                size-gated k-truss enumeration).
* UPGRADES    — rows-only r3 rows whose DuckDB oracle twins landed in
                later rounds; a fresh slot upgrades them to hash rows.
* OLDEST_R1   — bit-rot re-attestation: queries whose LATEST driver row
                is from round 1 (a 7-rounds-older codebase).
* NEW_R8      — this round's new classes (<= 9 per the verdict cap),
                appended as they land so the window stays <= 50.

13 round-1 rows plus the round-2 cohort queue for round 9 (R9_BACKLOG).
"""

import json
import os

from etl_airflow_spotify_spark.registry import DRIVER_ORDER, all_queries

WINDOW = 50

FORCED = ["optimal_threshold_selection", "threshold_operating_point"]

CHANGED_R8 = [
    "fairness_group_audit",   # X272 decimal->DOUBLE division fix
    "readability_fk_profile",  # X274 decimal->DOUBLE division fix
    "binseg_changepoints",    # X275 empty-pick guard
    "ktruss_peeling_profile",  # X225 size-gated round-1 enumeration
    "clustering_coefficient_profile",  # X167 intersect re-plan
]

# rows-only rows from the r3 window whose oracles exist at HEAD
UPGRADES = [
    "hll_sliding_distinct",
    "vector_topk_ivfpq_residual",
    "vector_topk_ivfpq_trained",
]

# latest driver row is CORRECTNESS_r01 — re-attest before they are 8
# rounds stale (r7 verdict item 4)
OLDEST_R1 = [
    "asof_purchase_click", "asof_tolerance_click", "concurrent_orders",
    "cube_order_status", "customer_order_history",
    "dedup_cluster_assign", "dedup_exact_groups", "dedup_first_event",
    "distinct_rows", "doc_fingerprints", "doc_stats",
    "events_json_stats", "events_trailing_window",
    "events_variant_stats", "filter_battery", "grouping_sets_sql",
    "join_left", "join_semi_anti", "language_id", "market_share",
    "multimodal_decode", "multimodal_frames", "multimodal_metadata",
    "multimodal_resize", "near_dup_minhash", "ngram_jaccard_blocked",
    "pivot_event_types", "pricing_summary", "promo_revenue",
    "range_join_price_band", "resample_gap_fill",
]

# Round-1-latest rows that did NOT fit this window — first claim on
# the round-9 window, together with the round-2-latest cohort.
R9_BACKLOG = [
    "revenue_by_region", "rollup_returns", "scalar_battery",
    "segment_stats", "sessionize_events", "setops_customers",
    "tfidf_cosine_pairs",
    "tfidf_top_terms", "top_orders_per_customer", "top_revenue_orders",
    "training_data_prep", "udf_surface_stats", "udf_zscore_groups",
    "word_frequencies",
]

# Operator classes ADDED in round 8 — appended to DRIVER_ORDER as they
# land so they are attested the round they land. Maps query name ->
# class tag.
NEW_R8: dict[str, str] = {
    "holt_damped_daily": "X278",
    "prefixspan_top_patterns": "X279",
    "friedman_priority_weeks": "X280",
    "token_bucket_rate_audit": "X281",
    "butterfly_copurchase_census": "X282",
    "ks_two_sample_prices": "X283",
    "brown_forsythe_nations": "X284",
    "sprt_conversion_monitor": "X285",
    "mcnemar_paired_rules": "X286",
}

MAX_NEW_R8 = 9  # r7 verdict item 7


def _correctness_rows() -> dict[str, list[tuple[int, dict]]]:
    root = os.path.join(os.path.dirname(__file__), "..")
    out: dict[str, list[tuple[int, dict]]] = {}
    for rnd in range(1, 8):
        path = os.path.join(root, f"CORRECTNESS_r{rnd:02d}.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            out.setdefault(name, []).append((rnd, row))
    return out


def _attested() -> set[str]:
    """Queries with a USABLE driver row (hash-green or declared
    rows-only) in any prior round. A hash-failed row is not an
    attestation."""
    return {name for name, rows in _correctness_rows().items()
            if any(r.get("err") in (None, "no_oracle")
                   and r.get("hash_match") is not False
                   for _, r in rows)}


def test_driver_order_no_duplicates():
    assert len(DRIVER_ORDER) == len(set(DRIVER_ORDER))


def test_driver_order_is_exactly_the_planned_window():
    expected = FORCED + CHANGED_R8 + UPGRADES + OLDEST_R1 + list(NEW_R8)
    assert list(DRIVER_ORDER) == expected
    assert len(DRIVER_ORDER) <= WINDOW


def test_new_r8_respects_verdict_cap():
    assert len(set(NEW_R8.values())) <= MAX_NEW_R8


def test_new_r8_reps_carry_their_tags():
    qs = all_queries()
    for name, tag in NEW_R8.items():
        assert name in qs, f"window rep {name} not registered"
        assert tag in qs[name].tags, f"{name} does not carry {tag}"


def test_driver_order_names_exist():
    qs = all_queries()
    missing = [n for n in DRIVER_ORDER if n not in qs]
    assert not missing, \
        f"DRIVER_ORDER references unregistered queries: {missing}"


def test_x137_twin_is_byte_identical():
    """The channel probe only proves something if the twin is the SAME
    computation: same Spark callable object, same oracle SQL string."""
    qs = all_queries()
    orig = qs["optimal_threshold_selection"]
    twin = qs["threshold_operating_point"]
    assert twin.spark_fn is orig.spark_fn
    assert twin.oracle == orig.oracle


def test_oldest_cohort_is_genuinely_round1_stale():
    """Every OLDEST_R1 slot re-attests a query whose latest driver row
    really is from round 1 — no slot wasted on a fresher row."""
    rows = _correctness_rows()
    for name in OLDEST_R1 + R9_BACKLOG:
        assert name in rows, f"{name} has no driver row at all"
        assert max(r for r, _ in rows[name]) == 1, (
            f"{name} has a driver row newer than round 1")


def test_upgrade_slots_now_have_oracles():
    """Each UPGRADES slot was rows-only when last checked but exports
    a DuckDB oracle at HEAD, so the fresh row will be a hash row."""
    qs = all_queries()
    rows = _correctness_rows()
    for name in UPGRADES:
        assert qs[name].oracle, f"{name} still has no oracle"
        last_round, last = max(rows[name], key=lambda t: t[0])
        assert last.get("hash_match") is None, (
            f"{name} already has a hash row (r{last_round})")


def test_changed_queries_all_have_oracles():
    qs = all_queries()
    for name in FORCED + CHANGED_R8:
        assert qs[name].oracle, f"{name} lost its oracle"


def test_window_has_no_rows_only_slots():
    """No slot may be spent on an oracle-less query: every rows-only-
    by-design query got its `err: no_oracle` row in r6."""
    qs = all_queries()
    rows_only = [n for n in list(qs)[:WINDOW] if qs[n].oracle is None]
    assert not rows_only, (
        f"rows-only queries holding r8 window slots: {rows_only}")


def test_every_query_attested_or_windowed():
    """Query-level invariant: anything without a driver row in a prior
    round must be inside this round's checked window or share every
    operator class with an evidenced query."""
    qs = all_queries()
    window = set(list(qs)[:WINDOW])
    attested = _attested()
    evidenced_tags = {t for n, s in qs.items()
                      if n in attested or n in window for t in s.tags}
    dark = [n for n in qs
            if n not in attested and n not in window
            and not set(qs[n].tags) <= evidenced_tags]
    assert not dark, f"never-attested queries with uncovered classes: {dark}"


def test_ledger_stays_closed():
    """Tag-level invariant: every operator class keeps either a prior
    attestation or a slot in this window (the r7 ledger must not
    re-open as classes are added)."""
    qs = all_queries()
    attested = _attested()
    covered = {t for s in list(qs.values())[:WINDOW] for t in s.tags}
    covered |= {t for n, s in qs.items() if n in attested for t in s.tags}
    all_tags = {t for s in qs.values() for t in s.tags}
    assert covered >= all_tags, (
        f"tags with neither an attestation nor a window slot: "
        f"{sorted(all_tags - covered)}"
    )
