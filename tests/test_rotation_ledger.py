"""Machine-checked rotation ledger (r12 verdict #2).

The driver sweeps the first 50 registered queries per round; staleness
rotation used to be a hand-maintained comment queue, and twice in two
rounds a row silently fell out of it (the 36-of-42 miscount in r12's
first draft; o3_topk missing from the r13 note). These tests recompute
the stamp table from the raw CORRECTNESS_r*.json artifacts and assert
the committed window IS the one the staleness policy produces — the
ledger can no longer drift from the evidence.

No Spark session needed: pure artifact + registry arithmetic.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _stamps(before_round: int | None = None) -> dict[str, int]:
    """Latest driver-green round per query: an oracled row counts when
    rows/schema/hash all match with no error; a rows-only waiver row
    counts when it recorded a clean ``no_oracle`` with a row count (the
    mm_extract_features precedent — its r1 ERR row does NOT count).

    ``before_round`` bounds the recomputation to artifacts from rounds
    strictly below it — the committed window targets WINDOW_ROUND and
    was computed from stamps < WINDOW_ROUND, so the reconciliation must
    use the same horizon. An unbounded glob turned the whole suite red
    the moment the driver's own artifact landed (r13 verdict "what's
    wrong" #1); rotation-due is now the separate non-failing signal in
    ``test_rotation_due_signal``."""
    stamps: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        if before_round is not None and rnd >= before_round:
            continue
        for name, v in json.load(open(f)).items():
            green = (
                v.get("rows_match") is True
                and v.get("schema_match") is True
                and v.get("hash_match") is True
                and not v.get("err")
            )
            waived = v.get("err") == "no_oracle" and v.get("spark_rows") is not None
            if green or waived:
                stamps[name] = max(stamps.get(name, 0), rnd)
    return stamps


def _entry():
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as e  # noqa: F401  (side effect: finalize_order)
    from data_engineering_spark import registry

    return e, registry


def test_window_is_exactly_fifty_registered_names():
    e, registry = _entry()
    window = registry.PRIORITY_WINDOW
    assert len(window) == 50, len(window)
    assert len(set(window)) == 50  # no duplicate slots
    assert window == e.WINDOW_LEAD + e.WINDOW_STALE
    unknown = [n for n in window if n not in registry.QUERIES]
    assert not unknown, unknown
    # every non-waived window slot is oracle-backed (registry enforces
    # this too; asserting here keeps the invariant visible if the
    # registry guard is ever relaxed)
    weak = [
        n
        for n in window
        if n not in registry.ORACLE and n not in registry.ROWS_ONLY_WAIVERS
    ]
    assert not weak, weak


def test_stale_tail_matches_recomputed_staleness_policy():
    """WINDOW_STALE must be EXACTLY the oldest-stamped oracled queries by
    (latest green stamp, original registration order), excluding
    WINDOW_LEAD — recomputed from the artifacts, not trusted from the
    comment. A dropped row (the o3_topk class), a stale row displaced by
    hand, or a fresher row jumping the queue all fail here."""
    e, registry = _entry()
    stamps = _stamps(before_round=e.WINDOW_ROUND)
    orig = registry.ORIGINAL_ORDER
    assert orig, "finalize_order must record ORIGINAL_ORDER"
    lead = set(e.WINDOW_LEAD)
    cands = [n for n in orig if n in registry.ORACLE and n not in lead]
    cands.sort(key=lambda n: (stamps.get(n, 0), orig.index(n)))
    expect = cands[: 50 - len(e.WINDOW_LEAD)]
    assert e.WINDOW_STALE == expect, (
        "WINDOW_STALE drifted from the recomputed staleness policy:\n"
        f"missing={sorted(set(expect) - set(e.WINDOW_STALE))}\n"
        f"extra={sorted(set(e.WINDOW_STALE) - set(expect))}\n"
        f"(or order drift)"
    )


def test_lead_slots_are_changed_or_unproven_not_staleness_jumpers():
    """Every hand-curated LEAD slot must be justifiable as something the
    staleness policy cannot rank: a never-driver-proven query (no stamp)
    or an explicitly re-proof-queued changed shape. The machine-checkable
    half: a LEAD entry must NOT be one the stale tail would have chosen
    anyway at its own stamp — i.e. LEAD may only contain names that are
    (a) unstamped, (b) rows-only waivers, or (c) stamped but listed as a
    changed shape in the window comment. (c) can't be parsed from
    intent, so the enforced floor is: no LEAD entry may carry the single
    OLDEST live stamp class while claiming a lead slot — those belong to
    the policy tail where the reconciliation test tracks them."""
    e, registry = _entry()
    stamps = _stamps(before_round=e.WINDOW_ROUND)
    # unstamped (never-proven) queries are EXACTLY what LEAD is for —
    # the floor applies only to queries that already carry a stamp
    stamped = [stamps[n] for n in registry.ORACLE if n in stamps]
    oldest = min(stamped)
    offenders = [
        n
        for n in e.WINDOW_LEAD
        if n in registry.ORACLE and stamps.get(n) == oldest
    ]
    assert not offenders, (
        f"LEAD entries {offenders} carry the oldest live stamp r{oldest} — "
        "oldest-cohort rows must ride WINDOW_STALE so the reconciliation "
        "test tracks them (the o3_topk class)"
    )


def test_rotation_due_signal():
    """NON-FAILING rotation reminder (r13 verdict "next round" #2): when
    a CORRECTNESS artifact from WINDOW_ROUND or later exists on disk,
    the committed window has been executed and the NEXT round's window
    is due — surface that as a skip-with-message, never a failure, so
    the suite is green on the sealed tree AND after the driver's
    artifact lands. The reconciliation tests above stay pinned to the
    window's own horizon (< WINDOW_ROUND)."""
    import pytest

    e, _ = _entry()
    executed = sorted(
        int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if int(re.search(r"r(\d+)", os.path.basename(f)).group(1)) >= e.WINDOW_ROUND
    )
    if executed:
        pytest.skip(
            f"rotation due: CORRECTNESS_r{executed[-1]:02d}.json exists — commit the "
            f"r{executed[-1] + 1} window (recompute WINDOW_STALE from stamps "
            f"< {executed[-1] + 1} and bump WINDOW_ROUND)"
        )


def test_every_oracled_query_has_ever_been_proven_or_is_windowed():
    """No oracled query may exist without either a green stamp or a slot
    in the current window — a newly added query that misses the window
    would otherwise wait invisibly (never-proven outranks staleness, per
    the standing rule)."""
    e, registry = _entry()
    stamps = _stamps(before_round=e.WINDOW_ROUND)
    window = set(registry.PRIORITY_WINDOW)
    orphans = [
        n for n in registry.ORACLE if n not in stamps and n not in window
    ]
    assert not orphans, orphans
