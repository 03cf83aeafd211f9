"""The driver's per-round oracle sweep must stay self-checking.

Round 6 silently recorded 50 of 51 registered queries
(``fsst_roundtrip`` was absent from CORRECTNESS_r06.json while present
in every prior round's file); nothing failed, so the gap was only
caught by the judge re-running the query by hand.  These tests make
that failure mode loud: the latest CORRECTNESS_r*.json in the repo
root must cover every key in ``queries()`` that existed when it was
recorded.

Queries added AFTER the latest correctness file was written are
exempted via NEW_SINCE_LAST_SWEEP — move them out of the set once the
next round's file lands (the test nags if an exemption has become
stale, so the set cannot rot).
"""
from __future__ import annotations

import glob
import json
import os
import re

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Query keys registered in queries() but added after the most recent
# driver sweep on record.  Round 7 additions go here; prune when
# CORRECTNESS_r07.json exists.
NEW_SINCE_LAST_SWEEP: set[str] = {"multimodal_jpeg", "repetition_stats",
                                  "pii_scrub", "ngram_jaccard_pairs",
                                  "decontaminate"}

# Historical sweep gaps already adjudicated by hand: the round-6
# VERDICT records the judge re-running fsst_roundtrip against its
# DuckDB oracle at sf0.001 AND sf0.01 (both exact).  Listed per-file
# so the exemption can never leak onto a future sweep.
KNOWN_ADJUDICATED_GAPS = {
    "CORRECTNESS_r06.json": {"fsst_roundtrip"},
}


def _latest_correctness():
    files = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
    if not files:
        return None, None
    with open(files[-1]) as fh:
        return files[-1], json.load(fh)


def test_expected_query_count_matches_registry():
    assert entry.EXPECTED_QUERY_COUNT == len(entry.queries())


def test_oracle_keys_subset_of_queries():
    q, o = set(entry.queries()), set(entry.oracle_sql())
    assert o <= q, f"oracle_sql keys missing from queries(): {o - q}"


def test_latest_sweep_covered_every_registered_query():
    path, data = _latest_correctness()
    if data is None:
        return  # fresh checkout without driver artifacts
    recorded = set(data)
    adjudicated = KNOWN_ADJUDICATED_GAPS.get(os.path.basename(path), set())
    missing = (set(entry.queries()) - recorded - NEW_SINCE_LAST_SWEEP
               - adjudicated)
    assert not missing, (
        f"{os.path.basename(path)} is missing registered queries "
        f"{sorted(missing)} — the driver sweep silently skipped them "
        f"(round-6 fsst_roundtrip failure mode)")
    stale = NEW_SINCE_LAST_SWEEP & recorded
    assert not stale, (
        f"NEW_SINCE_LAST_SWEEP exemptions already covered by "
        f"{os.path.basename(path)}: {sorted(stale)} — prune them")
