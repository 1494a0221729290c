"""Pure-function audit of the dialect IN-list rewrite scanner
(engine._rewrite_in_lists): only heterogeneous string/non-string
operand mixes are lowered; keywords, subqueries, string literals and
homogeneous lists pass through untouched; NOT IN keeps three-valued
logic. (The semantic results are covered by the in_predicate corpus
family; this pins the scanner itself.)"""

from __future__ import annotations

from pyspark.sql import types as T

from openmldb_spark.sql.engine import _rewrite_in_lists


class _Field:
    def __init__(self, name, dt):
        self.name, self.dataType = name, dt


class _Schema:
    def __init__(self, fields):
        self.fields = fields


class _DF:
    schema = _Schema([_Field("c1", T.StringType()), _Field("n1", T.IntegerType())])


UNTOUCHED = [
    "CAST(x AS INT)",              # INT) is not IN (
    "a JOIN (select 1)",
    "c1 IN ('a', 'b')",            # homogeneous strings
    "n1 IN (1, 2, 3)",             # homogeneous numerics
    "c1 NOT IN ('a', 'b')",
    "instr('IN (x)', c1)",         # inside a string literal
    "x IN (SELECT a FROM t)",      # subquery
    "unknown_col IN (1, 'x')",     # unknown stringness → conservative
]

REWRITTEN = [
    "n1 IN (1, '2')",
    "c1 IN (1.5, 2.5)",
    "c1 NOT IN (1.5, 'x')",
    "1 IN (1.0, '2')",
]


def test_untouched():
    for t in UNTOUCHED:
        assert _rewrite_in_lists(t, _DF()) == t, t


def test_rewritten_shapes():
    for t in REWRITTEN:
        out = _rewrite_in_lists(t, _DF())
        assert out != t, t
        assert " IN " not in out.upper() or "typeof" in out  # lowered
    # NOT IN keeps the negation around the whole chain
    out = _rewrite_in_lists("c1 NOT IN (1.5, 'x')", _DF())
    assert out.startswith("(NOT (")
