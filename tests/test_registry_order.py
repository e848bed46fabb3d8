"""Pin the driver-window invariant.

The correctness driver checks only the first 50 entries of ``queries()``
in dict order (round 1 evidence: CORRECTNESS_r01.json is exactly the
first 50 registrations). These tests guarantee the curated order gets
every query a driver row at least once across rounds: everything never
attested by a prior round's CORRECTNESS file must sit inside the
window, or share every operator class with an evidenced query.

Round 7: CORRECTNESS_r01-06 together attest 294 queries (277
hash-green + 16 rows-only + X137's repeat hash-red row, which does NOT
count). The r7 window closes the ledger: 1 forced X137 slot (histogram
key re-snapped to FLOOR(x*100+0.5) this round) + one representative
per r6-queued backlog class (25) + one per NEW_R6 class (15) = 41
slots, with the remaining <= 9 slots taken by NEW_R7 — this round's
additions, attested the SAME round they land per the r6 verdict's
<= 9 new-family cap. After this window, zero driver-dark classes
remain and every future round only needs slots for its own additions.
"""

import json
import os

from etl_airflow_spotify_spark.registry import DRIVER_ORDER, all_queries

WINDOW = 50

# The 25 operator classes queued by the r6 window (R7_BACKLOG there),
# each with the oracle-checked representative that claims its slot.
R7_CARRIED: dict[str, str] = {
    "X96": "copurchase_weighted_sssp",
    "X109": "compaction_plan",
    "X116": "dedup_threshold_sweep",
    "X117": "conformal_interval_coverage",
    "X127": "hits_supplier_part",
    "X132": "consistent_hash_rebalance",
    "X142": "bagged_stump_forest",
    "X147": "capture_recapture_daily",
    "X150": "bradley_terry_suppliers",
    "X173": "bcubed_linkage_eval",
    "X207": "power_iteration_hubs",
    "X208": "viterbi_state_decode",
    "X211": "matrix_profile_daily",
    "X212": "encoding_efficiency_audit",
    "X215": "textrank_keywords",
    "X218": "theil_nation_decomposition",
    "X221": "voptimal_daily_histogram",
    "X222": "offpolicy_dr_eval",
    "X228": "link_prediction_eval",
    "X229": "page_hinkley_drift",
    "X238": "gmm_em_values",
    "X242": "betweenness_kseeds",
    "X245": "kruskal_wallis_values",
    "X248": "platt_scaling_calibration",
    "X251": "borda_condorcet_brands",
}

# Operator classes added in round 6 after that round's window was
# fixed; their first driver slot is this window.
NEW_R6: dict[str, str] = {
    "rbo_rank_overlap": "X254",
    "randomized_response_freq": "X255",
    "brier_decomposition": "X256",
    "window_funnel_depths": "X257",
    "horvitz_thompson_regions": "X258",
    "daily_peak_prominence": "X259",
    "esd_outlier_rounds": "X260",
    "stream_page_hinkley": "X261",
    "mondrian_kanon_partition": "X262",
    "loo_group_influence": "X263",
    "scc_pivot_fwbw": "X264",
    "roaring_container_plan": "X265",
    "fagin_ta_depth": "X266",
    "knn_shapley_valuation": "X267",
    "mmr_diverse_topk": "X268",
}

# Operator classes ADDED in round 7. Unlike prior rounds these do NOT
# queue for the next window: the r6 verdict caps them at 9 so they fit
# this window's spare slots and are attested the round they land.
# Maps query name -> class tag.
NEW_R7: dict[str, str] = {
    "fairness_group_audit": "X272",
    "cmh_stratified_assoc": "X273",
    "readability_fk_profile": "X274",
    "holt_winters_daily": "X269",
    "lossy_count_users": "X271",
    "binseg_changepoints": "X275",
    "auction_assignment": "X270",
    "ipf_raking_weights": "X276",
    "greedy_graph_coloring": "X277",
}

MAX_NEW_R7 = 9  # r6 verdict item 5


def _attested() -> set[str]:
    """Queries with a USABLE driver row (hash-green or declared
    rows-only) in any prior round's CORRECTNESS file. A row whose value
    hash FAILED (hash_match false) is not an attestation."""
    root = os.path.join(os.path.dirname(__file__), "..")
    out: set[str] = set()
    for rnd in range(1, 7):
        path = os.path.join(root, f"CORRECTNESS_r{rnd:02d}.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            rows = json.load(f)
        out |= {k for k, v in rows.items()
                if v.get("err") in (None, "no_oracle")
                and v.get("hash_match") is not False}
    return out


def test_driver_order_no_duplicates():
    assert len(DRIVER_ORDER) == len(set(DRIVER_ORDER))


def test_driver_order_is_exactly_the_planned_window():
    """The r7 window is fully enumerated: forced X137 + 25 carried +
    15 NEW_R6 + one representative per NEW_R7 class, within 50."""
    expected = (["optimal_threshold_selection"]
                + list(R7_CARRIED.values())
                + list(NEW_R6)
                + list(NEW_R7))
    assert list(DRIVER_ORDER) == expected
    assert len(DRIVER_ORDER) <= WINDOW


def test_new_r7_respects_verdict_cap():
    assert len(set(NEW_R7.values())) <= MAX_NEW_R7


def test_driver_order_names_exist():
    qs = all_queries()
    missing = [n for n in DRIVER_ORDER if n not in qs]
    assert not missing, f"DRIVER_ORDER references unregistered queries: {missing}"


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


def test_window_has_no_rows_only_slots():
    """Every rows-only-by-design query (X45/X69/X112) got its
    `err: no_oracle` driver row in round 6 — no window slot may be
    spent on one this round."""
    qs = all_queries()
    rows_only = [n for n in list(qs)[:WINDOW] if qs[n].oracle is None]
    assert not rows_only, (
        f"rows-only queries holding r7 window slots: {rows_only}")


def test_window_is_all_dark():
    """No CURATED slot is wasted re-attesting an already-green query
    (X137's prior rows are hash-red, so it is dark by definition).
    Window slots beyond len(DRIVER_ORDER) spill to registration order
    — harmless re-attestation of r1-green queries until NEW_R7 claims
    them."""
    attested = _attested()
    wasted = [n for n in DRIVER_ORDER if n in attested]
    assert not wasted, f"already-attested queries in DRIVER_ORDER: {wasted}"


def test_first_window_covers_every_tag():
    """Tag-level invariant: every operator class has a driver row this
    round or an attested row from a prior round — the ledger CLOSES
    with this window (no backlog set may remain)."""
    qs = all_queries()
    attested = _attested()
    covered = {t for s in list(qs.values())[:WINDOW] for t in s.tags}
    covered |= {t for n, s in qs.items() if n in attested for t in s.tags}
    all_tags = {t for s in qs.values() for t in s.tags}
    assert covered >= all_tags, (
        f"tags with neither an attestation nor a window slot: "
        f"{sorted(all_tags - covered)}"
    )


def test_carried_representatives_are_dark_and_tagged():
    """Every carried class's representative exists, carries the class
    tag, and is genuinely dark (not already attested)."""
    qs = all_queries()
    attested = _attested()
    for tag, name in {**R7_CARRIED,
                      **{v: k for k, v in NEW_R6.items()},
                      **{v: k for k, v in NEW_R7.items()}}.items():
        assert name in qs, f"window rep {name} not registered"
        assert tag in qs[name].tags, f"{name} does not carry {tag}"
        assert name not in attested, (
            f"{name} already attested; window slot for {tag} is wasted")
