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
    WINDOW_ROUND,
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


def test_window_policy():
    """Round-agnostic rotation policy (VERDICT r4 "What's wrong" #1): the
    50-key window must (a) re-check every key that FAILED its most recent
    driver check, and (b) waste no slot on a driver-green key while a
    never-checked key waits outside the window.

    Only driver rounds STRICTLY OLDER than ``WINDOW_ROUND`` count: the
    ordering was rotated with that information, and a fresh CORRECTNESS
    drop from the current round must not retro-invalidate it (the round-4
    version of this test failed the suite on its own success)."""
    import json

    green: set[str] = set()
    failed: set[str] = set()
    pat = re.compile(r"CORRECTNESS_r(\d+)\.json$")
    for fname in sorted(os.listdir(REPO)):
        m = pat.match(fname)
        if not m or int(m.group(1)) >= WINDOW_ROUND:
            continue
        with open(os.path.join(REPO, fname)) as f:
            for k, v in json.load(f).items():
                if v.get("hash_match") is True:
                    green.add(k)
                    failed.discard(k)
                else:
                    failed.add(k)
                    green.discard(k)
    window = CANONICAL_ORDER[:50]
    missing = [k for k in failed if k not in window]
    assert not missing, f"known driver failures left out of window: {missing}"
    unchecked = [k for k in CANONICAL_ORDER if k not in green | failed]
    if any(k not in window for k in unchecked):
        stale = [k for k in window if k in green]
        assert not stale, (
            f"window wastes slots on driver-green keys: {stale}"
        )
    # WINDOW_ROUND must not lag a CORRECTNESS file the rotation should
    # have consumed by more than one round (the file for WINDOW_ROUND
    # itself may legitimately appear while the round is in flight).
    rounds = [
        int(m.group(1))
        for f in os.listdir(REPO)
        if (m := pat.match(f))
    ]
    assert WINDOW_ROUND >= max(rounds), (
        f"CANONICAL_ORDER rotated for r{WINDOW_ROUND} but newer driver "
        f"results exist (r{max(rounds)}) — re-rotate and bump WINDOW_ROUND"
    )


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


def test_datasource_builders_apply_runtime_confs():
    """Every Python-DataSource registration must be immediately
    preceded by apply_runtime_confs(spark): the driver hands builders
    a PLAIN session, and pushFilters-implementing sources hard-fail
    unless spark.sql.python.filterPushdown.enabled is set at runtime.
    Round 5's exhaustive drive caught 4 window keys failing exactly
    this way when a netcdf key ran FIRST on a fresh session."""
    pkg = os.path.join(REPO, "netcdf4_variable_streamer_spark")
    bad = []
    for rel in ("sources/queries.py", "streaming/queries.py"):
        lines = open(os.path.join(pkg, rel)).read().split("\n")
        for i, line in enumerate(lines):
            if "spark.dataSource.register(" not in line:
                continue
            prev = [x for x in lines[:i] if x.strip()][-1]
            if (
                "apply_runtime_confs" not in prev
                and "dataSource.register" not in prev
            ):
                bad.append(f"{rel}:{i + 1}")
    assert not bad, (
        f"dataSource.register without apply_runtime_confs before it: {bad}"
    )
