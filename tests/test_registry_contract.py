"""Registry/doc drift guards (VERDICT r2 "Next round" #7).

The driver's correctness window is the first 50 keys of
``ordered_registry()``, so CANONICAL_ORDER is part of the external
contract. These tests pin it to the actual registry (no dangling names,
no unlisted keys, no duplicates) and pin every doc's claimed key count
to ``len(REGISTRY)`` so the 188-vs-191 drift class cannot recur.
"""

from __future__ import annotations

import os
import re

import netcdf4_variable_streamer_spark.operators  # noqa: F401
import netcdf4_variable_streamer_spark.sources  # noqa: F401
import netcdf4_variable_streamer_spark.streaming  # noqa: F401
from netcdf4_variable_streamer_spark.registry import (
    CANONICAL_ORDER,
    REGISTRY,
    ordered_registry,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_canonical_order_is_exactly_the_registry():
    assert len(set(CANONICAL_ORDER)) == len(CANONICAL_ORDER), "duplicates"
    missing = set(REGISTRY) - set(CANONICAL_ORDER)
    dangling = set(CANONICAL_ORDER) - set(REGISTRY)
    assert not missing, f"registered but unordered: {sorted(missing)}"
    assert not dangling, f"ordered but unregistered: {sorted(dangling)}"
    assert list(ordered_registry()) == CANONICAL_ORDER


def test_round3_window_has_no_previously_checked_keys():
    """Positions 1-50 must all be keys without a driver row in r01/r02
    (the round-3 rotation policy)."""
    import json

    checked: set[str] = set()
    for fname in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
        path = os.path.join(REPO, fname)
        if os.path.exists(path):
            with open(path) as f:
                checked |= set(json.load(f))
    window = CANONICAL_ORDER[:50]
    stale = [k for k in window if k in checked]
    assert not stale, f"window wastes slots on driver-green keys: {stale}"


def test_doc_key_counts_match_registry():
    """Every 'NNN contract keys' / 'NNN registry keys' claim in the docs
    must equal the live registry size — counts are asserted, not
    hand-maintained."""
    n = len(REGISTRY)
    pat = re.compile(r"(\d+)\s+(?:contract|registry)\s+keys")
    found_any = False
    for doc in ("README.md", "SURVEY.md", "SCALE.md"):
        text = open(os.path.join(REPO, doc)).read()
        for m in pat.finditer(text):
            found_any = True
            assert int(m.group(1)) == n, (
                f"{doc} claims {m.group(1)} keys; registry has {n}"
            )
    assert found_any, "no key-count claims found in docs"


def test_scale_appendix_covers_every_key():
    """SCALE.md's per-key class appendix must mention every registry key
    — a key without a scale classification is an unreviewed key."""
    text = open(os.path.join(REPO, "SCALE.md")).read()
    appendix = text[text.index("## Appendix") :]
    missing = [k for k in REGISTRY if f"`{k}`" not in appendix]
    assert not missing, f"keys without a scale class: {missing}"
