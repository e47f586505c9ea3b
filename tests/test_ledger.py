"""Driver-window rotation invariants (the certification ledger).

The driver stamps the first 50 `queries()` keys each round
(CORRECTNESS_r{N}.json).  The whole multi-round plan rests on two
mechanical invariants that have so far been prose in registry.py:

1. PRIORITY is exactly 50 unique registered names.
2. PRIORITY never wastes a slot: either it contains no name that
   already carries a driver stamp (a freshly rotated window), or it
   IS the just-stamped window from the newest CORRECTNESS file (the
   round-close moment, before the next rotation).

If invariant 2 fails at a round open, the rotation was forgotten and
the round would re-certify 50 already-green ops — the exact mistake
ADVICE r5 item 2 was about.  No Spark session needed; pure file
checks.
"""

from __future__ import annotations

import glob
import json
import os
import re

from trip_data_pipeline_spark.registry import OPS, PRIORITY, ROLLOVER, queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FRESHNESS = os.path.join(REPO, "docs", "STAMP_FRESHNESS.json")


def _stamp_files() -> list[str]:
    return sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)),
    )


def _green(path: str) -> set[str]:
    out = set()
    for name, v in json.load(open(path)).items():
        # hash-PASS, or the declared rows-only contract (no_oracle + ran)
        if (v.get("hash_match") is True) or (
            v.get("err") == "no_oracle" and v.get("spark_rows") is not None
        ):
            out.add(name)
    return out


def test_priority_is_50_unique_registered_names():
    queries()
    assert len(PRIORITY) == 50
    assert len(set(PRIORITY)) == 50
    missing = [n for n in PRIORITY if n not in OPS]
    assert not missing, missing


def test_priority_window_never_wastes_a_slot():
    files = _stamp_files()
    if not files:
        return  # round 1: nothing stamped yet
    newest = _green(files[-1])
    earlier: set[str] = set()
    for f in files[:-1]:
        earlier |= _green(f)
    stamped = earlier | newest
    unstamped = set(queries().keys()) - stamped
    window = set(PRIORITY)
    if len(unstamped) >= 50:
        # Mid-ledger: a full fresh window exists, so demand one (or the
        # just-stamped round-close state before the next rotation).
        fresh = not (window & stamped)
        just_stamped = window <= newest and not (window & earlier)
        assert fresh or just_stamped, (
            "PRIORITY overlaps prior driver stamps without being the "
            f"just-stamped window — rotate it: {sorted(window & earlier)[:8]}"
        )
    else:
        # Final window: fewer unstamped ops remain than slots.  No slot
        # is wasted iff EVERY remaining unstamped op is inside the
        # window; the leftover slots are spares and may re-stamp greens
        # (each spare carries a recorded rationale in registry.py).
        # The just-stamped round-close state (everything green, window
        # fully inside the newest stamp) also satisfies this: unstamped
        # is then empty and the containment check is vacuous.
        left_out = unstamped - window
        assert not left_out, (
            "final PRIORITY window omits never-stamped ops — they would "
            f"never certify: {sorted(left_out)[:8]}"
        )


# ---------------------------------------------------------------------------
# Stamp freshness (VERDICT r9 item 1): with the ledger closed, windows
# are re-certification lists and "no op's driver stamp may predate its
# last fn/oracle change" becomes the binding invariant.  The audit is
# expensive (git worktrees per round tree), so it runs offline
# (tools/stamp_freshness.py -> docs/STAMP_FRESHNESS.json) and the tests
# here keep the artifact honest against the CURRENT tree.
# ---------------------------------------------------------------------------


def _artifact() -> dict:
    assert os.path.exists(FRESHNESS), (
        "docs/STAMP_FRESHNESS.json missing — run tools/stamp_freshness.py"
    )
    return json.load(open(FRESHNESS))


def test_freshness_artifact_matches_current_tree():
    """The artifact's per-op 'current' fingerprints must equal what the
    tree in front of us actually fingerprints to — otherwise an op
    changed after the last audit and the stale list may be incomplete.
    Fix: re-run tools/stamp_freshness.py and re-rotate if needed."""
    from tools.stamp_freshness import current_fingerprints

    art = _artifact()["ops"]
    cur = current_fingerprints()
    assert set(art) == set(cur), "registry and artifact op sets differ"
    drifted = [n for n in cur if art[n]["current"] != cur[n]]
    assert not drifted, (
        "ops changed since the last freshness audit — re-run "
        f"tools/stamp_freshness.py: {sorted(drifted)[:8]}"
    )


def test_every_stale_stamp_is_windowed_or_rolled_over():
    """No stale-stamped op may sit outside PRIORITY ∪ ROLLOVER — that is
    exactly how the class re-opens silently."""
    stale = set(_artifact()["stale_oldest_stamp_first"])
    covered = set(PRIORITY) | set(ROLLOVER)
    missing = stale - covered
    assert not missing, (
        "stale driver stamps with no re-certification slot: "
        f"{sorted(missing)[:8]}"
    )


def test_rollover_is_disjoint_registered_and_justified():
    queries()
    assert not (set(ROLLOVER) & set(PRIORITY))
    assert all(n in OPS for n in ROLLOVER)
    # Every rollover slot must be an actually-stale op (no padding).
    stale = set(_artifact()["stale_oldest_stamp_first"])
    assert set(ROLLOVER) <= stale
