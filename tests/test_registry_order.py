"""Pin the driver-window invariant.

The correctness driver checks only the first 50 entries of ``queries()``
in dict order (round 1 evidence: CORRECTNESS_r01.json is exactly the
first 50 registrations). These tests guarantee the curated order gets
every query a driver row at least once across rounds: everything never
attested by a prior round's CORRECTNESS file must sit inside the
window, be explicitly queued for a later window (R7_BACKLOG), or be a
round-6 addition (NEW_R6) that post-dates this round's fixed window.

Round 6: CORRECTNESS_r01-05 together attest 244 queries (231 hash-green
+ 13 declared rows-only; r5 went 49/50 with one hash-red row, X137's
float-F1 argmax, hardened to integer-domain this round and given the
window's forced first slot). 115 queries covering 87 operator classes
remained driver-dark at the r5 snapshot. The r6 window: 1 forced X137
slot + 46 greedy max-coverage slots over the 112 dark oracle-checked
queries (59 classes is the 47-slot ceiling — after the 11 disjoint
multi-tag dark queries are taken every remaining dark class is
single-tag, so greedy = optimal) + the 3 rows-only queries (X45/X69
BPE, X112 compression — r5 verdict item 4, deferred twice) in the
final slots. 25 classes stay dark one more round, each queued below
with its representative; 25 + len(NEW_R6) fits a single r7 window, so
attestation converges next round.
"""

import json
import os

from etl_airflow_spotify_spark.registry import DRIVER_ORDER, all_queries

WINDOW = 50

# Rows-only-by-design queries allowed to hold (late) window slots this
# round: the r5 verdict explicitly ordered a driver `err: no_oracle`
# row for each (item 4) after two rounds of deferral.
ROWS_ONLY_WINDOW = {"bpe_merge_table", "bpe_encode_stats",
                    "compression_quality"}

# Operator classes deliberately left dark until the r7 window, each
# with the oracle-checked representative that will claim its slot.
# 25 classes = 84 coverable darks - 59 covered by the r6 set-cover.
R7_BACKLOG: dict[str, str] = {
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

# Operator classes ADDED in round 6 (after the r6 window was fixed):
# locally oracle-green at sf0.001 AND sf0.01 under the strict gate,
# first eligible for a driver slot in the r7 window.
# Maps query name -> class tag.
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


def _attested() -> set[str]:
    """Queries with a USABLE driver row (hash-green or declared
    rows-only) in any prior round's CORRECTNESS file. A row whose value
    hash FAILED (hash_match false) is not an attestation."""
    root = os.path.join(os.path.dirname(__file__), "..")
    out: set[str] = set()
    for fname in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json",
                  "CORRECTNESS_r03.json", "CORRECTNESS_r04.json",
                  "CORRECTNESS_r05.json"):
        path = os.path.join(root, fname)
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


def test_driver_order_fills_window_exactly():
    """Round 6 allocates every one of the 50 slots explicitly."""
    assert len(DRIVER_ORDER) == WINDOW


def test_driver_order_names_exist():
    qs = all_queries()
    missing = [n for n in DRIVER_ORDER if n not in qs]
    assert not missing, f"DRIVER_ORDER references unregistered queries: {missing}"


def test_every_query_attested_or_windowed():
    """Query-level invariant: anything without a driver row in a prior
    round must be inside this round's checked window, be the queued
    representative of an R7_BACKLOG class, share every class with an
    evidenced query, or be a NEW_R6 addition."""
    qs = all_queries()
    window = set(list(qs)[:WINDOW])
    attested = _attested()
    backlogged = set(R7_BACKLOG.values())
    evidenced_tags = {t for n, s in qs.items()
                      if n in attested or n in window for t in s.tags}
    allowed_tags = evidenced_tags | set(R7_BACKLOG) | set(NEW_R6.values())
    dark = [n for n in qs
            if n not in attested and n not in window
            and n not in backlogged and n not in NEW_R6
            and not set(qs[n].tags) <= allowed_tags]
    assert not dark, f"never-attested queries with unqueued classes: {dark}"


def test_window_rows_only_is_exactly_the_sanctioned_trio():
    """Rows-only queries hold window slots only by explicit verdict
    order (X45/X69/X112 this round), and they sit at the window's END
    so every hash-checkable slot precedes them."""
    qs = all_queries()
    rows_only = [n for n in list(qs)[:WINDOW] if qs[n].oracle is None]
    assert set(rows_only) == ROWS_ONLY_WINDOW, (
        f"unexpected rows-only window set: {rows_only}")
    assert list(qs)[WINDOW - len(ROWS_ONLY_WINDOW):WINDOW] == [
        "bpe_merge_table", "bpe_encode_stats", "compression_quality"]


def test_window_is_all_dark():
    """No window slot is wasted re-attesting an already-green query."""
    qs = all_queries()
    attested = _attested()
    wasted = [n for n in list(qs)[:WINDOW] if n in attested]
    assert not wasted, f"already-attested queries in the window: {wasted}"


def test_first_window_covers_every_tag():
    """Tag-level invariant: every operator class has a driver row this
    round, an attested row from a prior round, an explicit R7_BACKLOG
    slot, or is a NEW_R6 class queued for r7."""
    qs = all_queries()
    attested = _attested()
    covered = {t for s in list(qs.values())[:WINDOW] for t in s.tags}
    covered |= {t for n, s in qs.items() if n in attested for t in s.tags}
    covered |= set(R7_BACKLOG) | set(NEW_R6.values())
    all_tags = {t for s in qs.values() for t in s.tags}
    assert covered >= all_tags, (
        f"tags with no attestation, window slot, or backlog entry: "
        f"{sorted(all_tags - covered)}"
    )


def test_backlog_representatives_registered():
    """Every backlogged class's queued representative exists, carries
    the class tag, and is genuinely dark (not already attested)."""
    qs = all_queries()
    attested = _attested()
    for tag, name in R7_BACKLOG.items():
        assert name in qs, f"backlog rep {name} not registered"
        assert tag in qs[name].tags, f"{name} does not carry {tag}"
        assert name not in attested, (
            f"{name} already attested; backlog entry for {tag} is stale")


def test_backlog_fits_next_window():
    """The r7 window (50 slots) must be able to FINISH attestation:
    25 carried classes + one representative per NEW_R6 class must fit
    a single window."""
    assert len(R7_BACKLOG) + len(set(NEW_R6.values())) <= WINDOW


def test_new_r6_names_registered():
    qs = all_queries()
    missing = [n for n in NEW_R6 if n not in qs]
    assert not missing, f"NEW_R6 references unregistered queries: {missing}"
    for name, tag in NEW_R6.items():
        assert tag in qs[name].tags, f"{name} does not carry {tag}"
