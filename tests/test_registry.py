"""Governance of the driver-contract query registry.

The correctness driver verifies only the first
``queries.DRIVER_CHECK_WINDOW`` entries of ``queries()`` (VERDICT.md
round 3): iteration order IS the official-verification set. These tests
pin that the explicit ``_DRIVER_ORDER`` manifest stays total over the
registry and that the queries which first gained driver coverage in
round 4 remain inside the window.
"""

from __future__ import annotations

from polars_sim_spark import queries as q

#: Queries that had no driver CORRECTNESS row before round 4
#: (VERDICT.md round 3, "What's missing" #1) — they must stay inside the
#: verification window so the official record keeps covering them.
ROUND4_WINDOW_ENTRANTS = [
    "remove_boilerplate_tokens",
    "embedding_label_centroids",
    "events_sliding_10m",
    "decontaminate_docs",
    "pack_documents_shards",
    "temperature_sample_docs",
    "dedup_incremental_docs",
    "docs_length_quartiles",
    "events_session_windows",
    "events_type_value_pivot",
    "events_cube_day_type",
    "daily_high_clicks_vs_purchases",
    "quality_model_score_docs",
    "tpch_q14_promo_revenue",
    "tpch_q22_idle_rich_customers",
    # registered in round 4, first driver row is CORRECTNESS_r04 —
    # rotating these out before that row lands would ship them
    # driver-unverified:
    "dedup_incremental_near_docs",
    "dedup_passages_docs",
    "text_repetition_signals",
    "tpch_q4_order_priority",
    "tpch_q17_small_qty_revenue",
]


def test_driver_order_is_total_and_applied():
    # Manifest and registry contain exactly the same names, no dupes…
    assert sorted(q._DRIVER_ORDER) == sorted(q.QUERIES)
    assert len(set(q._DRIVER_ORDER)) == len(q._DRIVER_ORDER)
    # …and the dicts actually iterate in manifest order (the property the
    # driver consumes via __spark_entry__.queries()).
    assert list(q.QUERIES) == q._DRIVER_ORDER
    oracle_names = [n for n in q._DRIVER_ORDER if n in q.ORACLES]
    assert list(q.ORACLES) == oracle_names


def test_round4_entrants_inside_driver_window():
    window = set(q._DRIVER_ORDER[: q.DRIVER_CHECK_WINDOW])
    missing = [n for n in ROUND4_WINDOW_ENTRANTS if n not in window]
    assert not missing, (
        f"queries without any pre-round-4 driver CORRECTNESS row fell out "
        f"of the first {q.DRIVER_CHECK_WINDOW} registry slots: {missing}"
    )


def test_tail_queries_all_have_oracles():
    # Tail queries are only crosschecked out-of-band; that check needs an
    # oracle to compare against, so none may be rows-only.
    tail = q._DRIVER_ORDER[q.DRIVER_CHECK_WINDOW:]
    assert all(n in q.ORACLES for n in tail)
