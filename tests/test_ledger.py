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

from trip_data_pipeline_spark.registry import OPS, PRIORITY, queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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
