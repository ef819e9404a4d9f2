"""Round-6: gate-order drift guards (the holt_winters/knn_classifier
class of bug from round 5), ADVICE fixes (interval overlap length,
markov zero-conversion guard, t-closeness single-bucket guard, Shopify
DSv2 bounded fan-out), and new round-6 operators."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Gate-order structural guards
# ---------------------------------------------------------------------------


def _registry():
    from d2b_dataframework_spark.plans import queries as Q

    return Q


def test_gate_order_unverified_always_precede_verified():
    """The permanent fix for the round-5 drift: a registry name that has
    never appeared in a driver CORRECTNESS artifact must sort BEFORE
    every already-verified name, no matter which staging tuple it was
    (or wasn't) added to.  A new query can therefore never silently
    queue behind the verified block and skip the sampled window."""
    Q = _registry()
    order = Q._gate_order()
    assert sorted(order) == sorted(Q.REGISTRY), "gate order must be a permutation"
    seen_verified = False
    for name in order:
        if name in Q._DRIVER_VERIFIED:
            seen_verified = True
        else:
            assert not seen_verified, (
                f"unverified query {name!r} ordered after a verified one — "
                "it would miss the driver's sampled window"
            )


def test_gate_order_covers_every_driver_artifact():
    """_DRIVER_VERIFIED must be a superset of every CORRECTNESS_r*.json
    the driver has produced so far — if an artifact lands and the set is
    not updated, the same names burn sampled-window slots for nothing."""
    Q = _registry()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    artifact_names: set[str] = set()
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        with open(path) as fh:
            data = json.load(fh)
        artifact_names.update(k for k in data if isinstance(data[k], dict))
    missing = artifact_names - set(Q._DRIVER_VERIFIED) - {"__error__"}
    # Tolerate artifact keys for queries since renamed/removed.
    missing &= set(Q.REGISTRY)
    assert not missing, (
        f"driver-verified names absent from _DRIVER_VERIFIED: {sorted(missing)}"
    )


def test_gate_order_staged_names_exist():
    """Frontload/newest tuples must reference real registry entries —
    a typo would silently drop the guarantee they encode."""
    Q = _registry()
    for name in Q._FRONTLOAD_R6 + Q._NEWEST_R6:
        assert name in Q.REGISTRY, name


def test_gate_window_is_all_first_time_names_this_round():
    """Round-6 contract from the verdict: with a 70-name backlog the
    entire ~50-slot sampled window must be first-time names."""
    Q = _registry()
    order = Q._gate_order()
    window = order[: Q._GATE_WINDOW]
    if len(Q.REGISTRY) - len(Q._DRIVER_VERIFIED) >= Q._GATE_WINDOW:
        assert all(n not in Q._DRIVER_VERIFIED for n in window)
        assert window[0] == "holt_winters" and window[1] == "knn_classifier"
