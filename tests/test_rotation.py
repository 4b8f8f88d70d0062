"""Unit tests for the driver-window rotation mechanism in
__spark_entry__ (_driver_verified_keys + the queries() front-load
ordering). A bug here silently wastes an entire 50-key driver window
(a round's worth of verification), so the MECHANISM is pinned against
synthetic CORRECTNESS files — the live-repo assertions are limited to
invariants that hold in every round.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __spark_entry__ as mod  # noqa: E402


def _write(tmp_path, rnd, rows):
    with open(tmp_path / f"CORRECTNESS_r{rnd:02d}.json", "w") as f:
        json.dump(rows, f)


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 5, "oracle_rows": 5, "err": None}
RED_HASH = {**GREEN, "hash_match": False}
RED_ERR = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": None, "oracle_rows": None, "err": "boom"}
ROWS_ONLY = {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": 5, "oracle_rows": None, "err": "no_oracle"}


def _keys(tmp_path, ignore_reverify=False, reverify={}, oracle_keys=set()):
    return mod._driver_verified_keys(
        ignore_reverify=ignore_reverify,
        root=str(tmp_path),
        reverify=dict(reverify),
        oracle_keys=set(oracle_keys),
    )


def test_green_row_verifies_red_rows_do_not(tmp_path):
    _write(tmp_path, 1, {"a": GREEN, "b": RED_HASH, "c": RED_ERR})
    assert _keys(tmp_path) == {"a"}


def test_later_green_overrides_earlier_red(tmp_path):
    _write(tmp_path, 1, {"a": RED_HASH})
    _write(tmp_path, 2, {"a": GREEN})
    assert _keys(tmp_path) == {"a"}


def test_reverify_stamps_invalidate_stale_greens_only(tmp_path):
    # a green in r1, implementation changed in r2 (stamp=2): r1's row
    # proves nothing; a fresh green in r3 re-verifies
    _write(tmp_path, 1, {"a": GREEN, "b": GREEN})
    assert _keys(tmp_path, reverify={"a": 2}) == {"b"}
    assert _keys(tmp_path, ignore_reverify=True, reverify={"a": 2}) == {"a", "b"}
    _write(tmp_path, 3, {"a": GREEN})
    assert _keys(tmp_path, reverify={"a": 2}) == {"a", "b"}


def test_rows_only_counts_only_while_still_rows_only(tmp_path):
    # a rows-only row verifies a key with no oracle — but if the key
    # has since been promoted to oracle-checked, the weak row is
    # ignored and the key front-loads for a full check
    _write(tmp_path, 1, {"a": ROWS_ONLY})
    assert _keys(tmp_path, oracle_keys=set()) == {"a"}
    assert _keys(tmp_path, oracle_keys={"a"}) == set()


def test_rows_only_error_without_rows_never_verifies(tmp_path):
    _write(tmp_path, 1, {"a": {**ROWS_ONLY, "spark_rows": None}})
    assert _keys(tmp_path, oracle_keys=set()) == set()


def test_schema_none_rows_match_counts_green(tmp_path):
    # older driver rows recorded rows_match with schema_match null
    _write(tmp_path, 1, {"a": {"rows_match": True, "schema_match": None,
                               "hash_match": None, "spark_rows": 3,
                               "oracle_rows": 3, "err": None}})
    assert _keys(tmp_path) == {"a"}


def test_unreadable_and_nondict_rows_are_skipped(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text("{not json")
    _write(tmp_path, 2, {"a": GREEN, "junk": "string-not-dict"})
    assert _keys(tmp_path) == {"a"}


def test_no_files_falls_back_to_prior_rounds_list(tmp_path):
    got = _keys(tmp_path)
    exp = set(mod._DRIVER_VERIFIED_PRIOR_ROUNDS)
    assert got == exp
    # and reverify stamps subtract from the fallback too
    one = next(iter(exp))
    assert one not in _keys(tmp_path, reverify={one: 1})


# --- live-repo invariants (hold in every round) ---------------------


@pytest.fixture(scope="module")
def live_order():
    return list(mod.queries())


def test_live_ordering_partitions_every_key_exactly_once(live_order):
    assert len(live_order) == len(set(live_order))
    verified = mod._driver_verified_keys()
    ever = mod._driver_verified_keys(ignore_reverify=True)
    tiers = [
        [k for k in live_order if k not in verified and k not in ever],
        [k for k in live_order if k not in verified and k in ever],
        [k for k in live_order if k in verified],
    ]
    # ordering is exactly tier1 ++ tier2 ++ tier3
    assert live_order == tiers[0] + tiers[1] + tiers[2]


def test_live_red_or_new_keys_front_load(live_order):
    """Any key with NO green driver row in any round must sit in the
    never-green front-load — the driver's fixed 50-key prefix reaches
    it before any stale-green re-check."""
    verified = mod._driver_verified_keys()
    ever = mod._driver_verified_keys(ignore_reverify=True)
    never = [k for k in live_order if k not in verified and k not in ever]
    stale_or_green_positions = [
        live_order.index(k) for k in live_order if k in verified or k in ever
    ]
    if never and stale_or_green_positions:
        assert max(live_order.index(k) for k in never) < min(
            stale_or_green_positions
        )


def test_reverify_literal_lint_catches_shadowed_restamp(tmp_path):
    """r8 review #1: _REVERIFY keeps restamp HISTORY as duplicate
    dict keys (last wins), which is safe only append-at-end — a new
    stamp inserted ABOVE an existing later duplicate is silently
    shadowed. The lint enforces non-decreasing values per key and
    must flag the shadowing insertion, accept the append style, and
    pass on the real contract file."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from lint_contract import lint_reverify_literal

    ok = tmp_path / "ok.py"
    ok.write_text('_REVERIFY = {\n    "a": 2,\n    "b": 3,\n    "a": 5,\n}\n')
    assert lint_reverify_literal(str(ok)) == []

    bad = tmp_path / "bad.py"
    # the r8-reviewed failure mode: round-7 stamp inserted above the
    # historical round-4 entry -> the 4 wins and 7 is dead
    bad.write_text('_REVERIFY = {\n    "a": 7,\n    "b": 3,\n    "a": 4,\n}\n')
    found = lint_reverify_literal(str(bad))
    assert len(found) == 1 and "'a'" in found[0] and "round 4" in found[0]

    # refactoring the literal away must fail loudly, not silently
    # disable the guard (r8 second-pass review)
    gone = tmp_path / "gone.py"
    gone.write_text("_REVERIFY = dict(a=2)\n")
    missing = lint_reverify_literal(str(gone))
    assert len(missing) == 1 and "not found" in missing[0]

    # non-int stamps are flagged instead of crashing the comparison
    weird = tmp_path / "weird.py"
    weird.write_text('_REVERIFY = {\n    "a": "r9",\n}\n')
    flagged = lint_reverify_literal(str(weird))
    assert len(flagged) == 1 and "non-int" in flagged[0]

    # the live contract file must already satisfy the invariant
    root = os.path.join(os.path.dirname(__file__), "..")
    assert lint_reverify_literal(os.path.join(root, "__spark_entry__.py")) == []
