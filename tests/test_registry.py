"""Governance of the driver-contract query registry.

The correctness driver verifies only the first
``queries.DRIVER_CHECK_WINDOW`` entries of ``queries()`` (VERDICT.md
rounds 3-4): iteration order IS the official-verification set. Since
round 5 the order is STRUCTURAL — ``_apply_driver_order`` stably sorts
the ``_MANIFEST`` by each query's number of prior fully-green driver
CORRECTNESS rounds — so never-driver-verified queries (including any
added mid-round) always occupy the head of the window and long-green
veterans rotate to the crosschecked tail. These tests pin that
invariant so a future refactor cannot silently ship an unverified
query past the window again.
"""

from __future__ import annotations

from polars_sim_spark import queries as q


def test_driver_order_is_total_and_applied():
    # Manifest and registry contain exactly the same names, no dupes…
    assert sorted(q._MANIFEST) == sorted(q.QUERIES)
    assert sorted(q._DRIVER_ORDER) == sorted(q._MANIFEST)
    assert len(set(q._MANIFEST)) == len(q._MANIFEST)
    # …and the dicts actually iterate in the computed order (the property
    # the driver consumes via __spark_entry__.queries()).
    assert list(q.QUERIES) == q._DRIVER_ORDER
    oracle_names = [n for n in q._DRIVER_ORDER if n in q.ORACLES]
    assert list(q.ORACLES) == oracle_names


def test_never_verified_queries_lead_the_window():
    """Every query with zero prior green driver rounds must sit inside
    the verification window (this is the whole point of the structural
    sort — VERDICT.md round 4, task #1)."""
    counts = q._green_round_counts()
    never = [n for n in q._DRIVER_ORDER if counts.get(n, 0) == 0]
    window = set(q._DRIVER_ORDER[: q.DRIVER_CHECK_WINDOW])
    overflow = [n for n in never if n not in window]
    assert len(never) <= q.DRIVER_CHECK_WINDOW, (
        f"{len(never)} never-verified queries exceed the "
        f"{q.DRIVER_CHECK_WINDOW}-slot window — too many additions in "
        "one round; stage them across rounds"
    )
    assert not overflow, (
        f"never-driver-verified queries fell outside the first "
        f"{q.DRIVER_CHECK_WINDOW} registry slots: {overflow}"
    )


def test_order_is_green_count_ascending():
    """The effective order is a stable sort of the manifest by prior
    green-round count — fewest first, manifest order within ties."""
    counts = q._green_round_counts()
    keys = [counts.get(n, 0) for n in q._DRIVER_ORDER]
    assert keys == sorted(keys)
    # Stability: within each count class, manifest order is preserved.
    manifest_pos = {n: i for i, n in enumerate(q._MANIFEST)}
    for c in set(keys):
        cls = [n for n in q._DRIVER_ORDER if counts.get(n, 0) == c]
        assert [manifest_pos[n] for n in cls] == sorted(
            manifest_pos[n] for n in cls
        )


def test_tail_queries_all_have_oracles():
    # Tail queries are only crosschecked out-of-band; that check needs an
    # oracle to compare against, so none may be rows-only.
    tail = q._DRIVER_ORDER[q.DRIVER_CHECK_WINDOW:]
    assert all(n in q.ORACLES for n in tail)
