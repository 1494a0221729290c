"""_split_anchor_pair precedence safety (ADVICE r3): a nested-aggregate
argument mixing precedence levels must NOT be split at a
higher-precedence operator (that would silently re-associate, e.g.
``c1 + c2 * agg()`` computed as ``(c1+c2) * anchor``). Pure-function
tests — no Spark session."""

from __future__ import annotations

from openmldb_spark.sql.engine import _split_anchor_pair

PH = ["__ph__"]


def test_simple_splits_still_work():
    assert _split_anchor_pair("c1 - `__ph__`", PH) == ("c1", "-", "`__ph__`")
    assert _split_anchor_pair("`__ph__` - c1", PH) == ("c1", "rsub", "`__ph__`")
    assert _split_anchor_pair("c1 < `__ph__`", PH) == ("c1", "<", "`__ph__`")
    # anchor-only expressions pass through
    assert _split_anchor_pair("`__ph__` + 1", PH) == (None, None, "`__ph__` + 1")


def test_mixed_precedence_is_rejected_not_reassociated():
    # would previously split at '*' into ((c1 + c2) * anchor)
    assert _split_anchor_pair("c1 + c2 * `__ph__`", PH) is None
    # would previously split at '+' into ((c1 < c2) + anchor)
    assert _split_anchor_pair("c1 < c2 + `__ph__`", PH) is None


def test_same_level_multiple_candidates_still_split():
    # first '+' fails (both sides have columns), second isolates
    assert _split_anchor_pair("c1 + c2 + `__ph__`", PH) == \
        ("c1 + c2", "+", "`__ph__`")
