"""SQL front-end for the OpenMLDB dialect subset.

Grammar parity targets (``docs/en/openmldb_sql/dql/``):

- ``SELECT ... FROM t [LAST JOIN t2 [ORDER BY t2.c] ON cond]*``
  (JOIN_CLAUSE.md) — LAST JOIN lowered onto ``operators.last_join``.
- ``WINDOW w AS ([UNION t2[,t3]] PARTITION BY ... ORDER BY ...
  ROWS|ROWS_RANGE BETWEEN <bound> AND <bound> [MAXSIZE n]
  [EXCLUDE CURRENT_TIME] [EXCLUDE CURRENT_ROW]
  [INSTANCE_NOT_IN_WINDOW])`` (WINDOW_CLAUSE.md) — lowered onto
  ``operators.window.window_agg`` (native Catalyst path when the frame
  allows, Arrow kernel otherwise).
- everything else (plain projections, WHERE/GROUP BY/HAVING/ORDER
  BY/LIMIT, scalar functions) is handed to Spark SQL verbatim, so the
  full Catalyst optimizer applies.

Strategy: parse only the dialect-specific clauses, rewrite the
statement into (joins → window feature passes → residual ANSI SQL over
the enriched frame). Table references like ``t1.col`` from joined
tables are rewritten to the engine's flattened/prefixed names.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmldb_spark.operators.last_join import last_join
from openmldb_spark.operators.window import Agg, WindowSpec, window_agg

__all__ = ["SqlEngine"]

_UNIT_MS = {"s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}

# aggregate names the window kernel understands (survey §2.4)
_WINDOW_FUNCS = {
    "sum", "count", "avg", "min", "max", "stddev", "stddev_pop", "var_samp",
    "var_pop", "median", "distinct_count", "count_where", "sum_where",
    "avg_where", "min_where", "max_where", "lag", "at", "first_value",
    "entropy", "drawdown", "ew_avg", "top", "topn_frequency", "top1_ratio",
    "sum_cate", "avg_cate", "count_cate", "min_cate", "max_cate",
}
_FUNC_CANON = {"std": "stddev", "stddev_samp": "stddev", "var_samp": "var", "variance": "var"}


@dataclass
class _WindowDef:
    name: str
    union_tables: list[str]
    partition_by: list[str]
    order_by: str
    frame: str
    preceding: int | None
    end_preceding: int
    open_preceding: bool
    maxsize: int
    exclude_current_time: bool
    exclude_current_row: bool
    instance_not_in_window: bool
    end_is_offset: bool = False
    open_end: bool = False


@dataclass
class _WindowItem:
    func: str
    args: list[str]
    window: str
    alias: str


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on sep at paren depth 0, respecting single-quoted strings."""
    out, depth, cur, i, in_str = [], 0, [], 0, False
    while i < len(s):
        ch = s[i]
        if in_str:
            cur.append(ch)
            if ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        out.append("".join(cur).strip())
    return [x for x in out if x]


def _extract_over_calls(item: str, win_names: set[str]):
    """Find every ``func(args) OVER w`` subexpression in a select item.

    Returns (rewritten_item, calls) where each call is
    (func, args_text, window, placeholder_col) and the rewritten item
    references the placeholder columns — so window calls can appear
    inside CASE WHEN / arithmetic (reference test_window_row.yaml
    id=19-22)."""
    calls = []
    out = []
    i = 0
    n = len(item)
    while i < n:
        m = re.match(r"(\w+)\s*\(", item[i:])
        if not m:
            out.append(item[i])
            i += 1
            continue
        fname = m.group(1)
        # balance parens to find the call's end
        j = i + m.end()
        depth = 1
        while j < n and depth:
            if item[j] == "(":
                depth += 1
            elif item[j] == ")":
                depth -= 1
            j += 1
        args_txt = item[i + m.end(): j - 1]
        mo = re.match(r"\s+over\s+(\w+)", item[j:], flags=re.I)
        canon = _FUNC_CANON.get(fname.lower(), fname.lower())
        if mo and canon in _WINDOW_FUNCS and mo.group(1).lower() in win_names:
            ph = f"__wcall{len(calls)}_{abs(hash((fname, args_txt))) % 10_000}__"
            calls.append((canon, args_txt, mo.group(1).lower(), ph, f"{fname}({args_txt})over {mo.group(1)}"))
            out.append(f"`{ph}`")
            i = j + mo.end()
        else:
            # recurse into the call's arguments — window calls may sit
            # inside scalar functions (e.g. isnull(lag(x,1) OVER w))
            inner, inner_calls = _extract_over_calls(args_txt, win_names)
            for c in inner_calls:
                ph2 = f"__wcall{len(calls)}_{abs(hash((c[0], c[1], len(calls)))) % 10_000}__"
                calls.append((c[0], c[1], c[2], ph2, c[4]))
                inner = inner.replace(f"`{c[3]}`", f"`{ph2}`")
            out.append(f"{fname}({inner})")
            i = j
    return "".join(out), calls


def _rewrite_where_aggs(sql: str) -> str:
    """GROUP-BY-context ``fn_where(x, cond)`` → ``fn(CASE WHEN cond
    THEN x END)`` (the reference's conditional aggregates outside
    windows — query/group_query.yaml id=7)."""
    pat = re.compile(r"(?i)\b(sum|count|avg|min|max)_where\s*\(")
    while True:
        m = pat.search(sql)
        if not m:
            return sql
        j = m.end()
        depth = 1
        while j < len(sql) and depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        args = _split_top(sql[m.end(): j - 1])
        if len(args) != 2:
            return sql
        repl = f"{m.group(1)}(CASE WHEN {args[1]} THEN {args[0]} END)"
        sql = sql[: m.start()] + repl + sql[j:]


def _strip_hash_comments(sql: str) -> str:
    """Dialect '#' line comments (quote-aware)."""
    out = []
    in_str = None
    i = 0
    while i < len(sql):
        ch = sql[i]
        if in_str:
            out.append(ch)
            if ch == in_str:
                in_str = None
        elif ch in ("'", '"'):
            in_str = ch
            out.append(ch)
        elif ch == "#":
            while i < len(sql) and sql[i] != "\n":
                i += 1
            continue
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def _rewrite_like_match(sql: str) -> str:
    """``[i]like_match(str, pat[, esc])`` → native LIKE/ILIKE."""
    pat = re.compile(r"(?i)\b(i?)like_match\s*\(")
    while True:
        m = pat.search(sql)
        if not m:
            return sql
        j = m.end()
        depth = 1
        while j < len(sql) and depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        args = _split_top(sql[m.end(): j - 1])
        op = "ILIKE" if m.group(1).lower() == "i" else "LIKE"
        esc = f" ESCAPE {args[2]}" if len(args) > 2 and args[2].strip() not in ("''", '""') else ""
        repl = f"(({args[0]}) {op} ({args[1]}){esc})"
        sql = sql[: m.start()] + repl + sql[j:]


def _name_inline_windows(q: str) -> tuple[str, list[str]]:
    """Replace anonymous ``OVER ( ... )`` windows with synthetic names,
    returning the rewritten statement + window definitions."""
    defs: list[str] = []
    out = []
    i = 0
    pat = re.compile(r"(?is)\bOVER\s*\(")
    while True:
        m = pat.search(q, i)
        if not m:
            out.append(q[i:])
            break
        j = m.end()
        depth = 1
        while j < len(q) and depth:
            if q[j] == "(":
                depth += 1
            elif q[j] == ")":
                depth -= 1
            j += 1
        body = q[m.end(): j - 1]
        if not re.search(r"(?is)\bROWS(_RANGE)?\s+BETWEEN", body):
            # ANSI window without a dialect frame → leave for Spark SQL
            out.append(q[i:j])
            i = j
            continue
        name = f"__anonw{len(defs)}__"
        defs.append(f"{name} AS ({body})")
        out.append(q[i: m.start()])
        out.append(f"OVER {name}")
        i = j
    return "".join(out), defs


def _split_set_union(q: str) -> list[tuple[str, str]]:
    """Split a statement at top-level UNION [ALL|DISTINCT] boundaries.

    Returns [(part_sql, mode)]; the WINDOW-clause UNION lives inside
    parentheses and is never at depth 0.
    """
    parts = []
    depth = 0
    low = q.lower()
    i = 0
    start = 0
    mode = "all"
    out = []
    while i < len(q):
        ch = q[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (depth == 0 and low.startswith("union", i) and re.match(r"union\b", low[i:])
              and (i == 0 or not (low[i - 1].isalnum() or low[i - 1] == "_"))):
            # not WINDOW-clause union (that is inside parens)
            j = i + 5
            m = re.match(r"\s+(all|distinct)\b", low[j:])
            nmode = m.group(1) if m else "distinct"
            if m:
                j += m.end()
            out.append((q[start:i].strip(), mode))
            mode = nmode
            start = j
            i = j
            continue
        i += 1
    out.append((q[start:].strip(), mode))
    return out


def _parse_bound(txt: str) -> tuple[int | None, bool, bool]:
    """→ (offset, is_open, is_current_row). Offsets: rows count or ms."""
    t = txt.strip().lower()
    if t == "current row":
        return 0, False, True
    is_open = False
    if " open " in f" {t} ":
        is_open = True
        t = t.replace("open", " ").strip()
    t = re.sub(r"\s+preceding$", "", t).strip()
    if t == "unbounded":
        return None, is_open, False
    # negative PRECEDING is legal in the dialect (reaches past the
    # current row's order key; buffer-order still caps at the current
    # buffer position — cases/function/window/test_window_row_range.yaml id=45)
    m = re.fullmatch(r"([+-]?\d+)\s*([smhd]?)", t)
    if not m:
        raise ValueError(f"cannot parse frame bound {txt!r}")
    v = int(m.group(1))
    if m.group(2):
        v *= _UNIT_MS[m.group(2)]
    return v, is_open, False


class SqlEngine:
    """Register DataFrames as tables, then ``sql(text)``."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.tables: dict[str, DataFrame] = {}
        self.index_ts: dict[str, str] = {}

    def register(self, name: str, df: DataFrame, index_ts: str | None = None) -> None:
        """``index_ts`` mirrors the reference's INDEX(..., ts=col): it
        determines storage iteration order, which defines unordered
        LAST JOIN's pick (the min-ts match)."""
        self.tables[name.lower()] = df
        if index_ts:
            self.index_ts[name.lower()] = index_ts

    def _table(self, name: str) -> DataFrame:
        n = name.lower()
        local = getattr(self, "_local_tables", None)
        if local and n in local:
            return local[n]
        if n not in self.tables:
            raise ValueError(f"unknown table {name!r}")
        return self.tables[n]

    _KEYWORDS = {"on", "order", "last", "where", "group", "window", "limit",
                 "having", "union", "join", "left", "inner"}

    def _inline_subqueries(self, text: str) -> str:
        """Replace top-level ``(select ...)`` [AS alias] groups in a
        FROM/JOIN region with registered temp-table names (evaluated
        recursively). Aliases may shadow real tables (reference
        test_lastjoin_complex.yaml id=4)."""
        out = []
        i, n = 0, len(text)
        while i < n:
            if text[i] == "(":
                j = i + 1
                depth = 1
                while j < n and depth:
                    if text[j] == "(":
                        depth += 1
                    elif text[j] == ")":
                        depth -= 1
                    j += 1
                inner = text[i + 1: j - 1]
                if re.match(r"(?is)^\s*select\b", inner):
                    df = self.sql(inner)
                    m = re.match(r"(?is)\s*(?:AS\s+)?(\w+)", text[j:])
                    alias = None
                    if m and m.group(1).lower() not in self._KEYWORDS:
                        alias = m.group(1)
                        j += m.end()
                    if alias is None:
                        alias = f"__sub{len(self._local_tables)}__"
                    self._local_tables[alias.lower()] = df
                    out.append(f" {alias} ")
                    i = j
                    continue
                out.append(text[i:j])
                i = j
            else:
                out.append(text[i])
                i += 1
        return "".join(out)

    # -- parsing ------------------------------------------------------------

    def _parse_window_defs(self, wtxt: str) -> dict[str, _WindowDef]:
        defs = {}
        for part in _split_top(wtxt):
            m = re.match(r"(?is)^\s*(\w+)\s+AS\s*\((.*)\)\s*$", part)
            if not m:
                raise ValueError(f"cannot parse window definition: {part!r}")
            name, body = m.group(1).lower(), m.group(2)
            union_tables: list[str] = []
            mu = re.search(r"(?is)\bUNION\s+(.+?)\s+PARTITION\s+BY", body)
            if mu:
                union_tables = [t.strip() for t in _split_top(mu.group(1))]
            mp = re.search(
                r"(?is)PARTITION\s+BY\s+(.+?)\s+ORDER\s+BY\s+(.+?)\s+(ROWS_RANGE|ROWS)\s+BETWEEN\s+(.+?)\s+AND\s+(.+?)\s*($|MAXSIZE|EXCLUDE|INSTANCE_NOT_IN_WINDOW)",
                body + " ",
            )
            if not mp:
                raise ValueError(f"cannot parse window body: {body!r}")
            part_cols = [self._strip_tbl(c) for c in mp.group(1).split(",")]
            order_col = self._strip_tbl(mp.group(2))
            frame = "rows_range" if mp.group(3).upper() == "ROWS_RANGE" else "rows"
            prec, open_p, _ = _parse_bound(mp.group(4))
            endoff, open_e, end_cur = _parse_bound(mp.group(5))
            # a closed end bound at offset 0 ("0 PRECEDING") ≡ CURRENT ROW
            end_is_offset = (not end_cur) and (bool(endoff) or open_e)
            maxsize = 0
            mm = re.search(r"(?is)\bMAXSIZE\s+(\d+)", body)
            if mm:
                maxsize = int(mm.group(1))
            defs[name] = _WindowDef(
                name=name,
                union_tables=union_tables,
                partition_by=part_cols,
                order_by=order_col,
                frame=frame,
                preceding=prec,
                end_preceding=(endoff or 0) if end_is_offset else 0,
                end_is_offset=end_is_offset,
                open_end=open_e,
                open_preceding=open_p,
                maxsize=maxsize,
                exclude_current_time=bool(re.search(r"(?i)EXCLUDE\s+CURRENT_TIME", body)),
                exclude_current_row=bool(re.search(r"(?i)EXCLUDE\s+CURRENT_ROW", body)),
                instance_not_in_window=bool(re.search(r"(?i)INSTANCE_NOT_IN_WINDOW", body)),
            )
        return defs

    def _strip_tbl(self, expr: str) -> str:
        """``t1.c3`` → flattened column name (joined right cols got
        prefixed); bare names pass through."""
        e = expr.strip()
        m = re.fullmatch(r"([A-Za-z_]\w*)\.([A-Za-z_]\w*)", e)
        if not m:
            return e
        tbl, col = m.group(1).lower(), m.group(2)
        return self._colmap.get((tbl, col.lower()), col)

    def _rewrite_refs(self, expr: str) -> str:
        def rep(m):
            tbl, col = m.group(1).lower(), m.group(2)
            return self._colmap.get((tbl, col.lower()), col)

        # identifiers only — must not touch float literals like 2.0
        out = re.sub(r"\b([A-Za-z_]\w*)\.([A-Za-z_]\w*)\b", rep, expr)
        bare = getattr(self, "_bare_map", None)
        if bare:
            # bare references to joined right-table columns (dialect
            # allows them when unambiguous) → flattened names
            def rep_bare(m):
                w = m.group(1)
                if m.group(2) == "(":  # function call
                    return m.group(0)
                return bare.get(w.lower(), w) + m.group(2)

            out = re.sub(r"(?<![\.\w])([A-Za-z_]\w*)\b(?!\.)(\s*\(|)", rep_bare, out)
        return out

    # -- execution ----------------------------------------------------------

    def sql(self, text: str) -> DataFrame:
        prev_local = getattr(self, "_local_tables", None)
        self._local_tables = dict(prev_local) if prev_local else {}
        try:
            return self._sql(text)
        finally:
            self._local_tables = prev_local

    def _sql(self, text: str) -> DataFrame:
        # backtick-quoted identifiers are plain names in this dialect;
        # '!expr' prefix negation (dialect) → ANSI NOT (keep '!=')
        q = text.replace("`", "").strip().rstrip(";").strip()
        q = _strip_hash_comments(q)
        # a fully parenthesized statement is its inner statement
        while q.startswith("(") and q.endswith(")"):
            depth = 0
            whole = True
            for i, ch in enumerate(q):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0 and i < len(q) - 1:
                        whole = False
                        break
            inner = q[1:-1].strip()
            if not whole or not re.match(r"(?is)^(select|with)\b", inner):
                break
            q = inner
        q = re.sub(r"!(?!=)\s*", "NOT ", q)
        # dialect spellings Spark lacks
        q = re.sub(r"(?i)\bMOD\b(?!\s*\()", "%", q)
        q = re.sub(r"(?i)\bAS\s+BOOL\b", "AS BOOLEAN", q)
        q = re.sub(r"(?i)\bbool\s*\(", "boolean(", q)
        q = re.sub(r"(?i)\bint16\s*\(", "smallint(", q)
        q = re.sub(r"(?i)\bint32\s*\(", "int(", q)
        q = re.sub(r"(?i)\bint64\s*\(", "bigint(", q)
        q = re.sub(r"(?i)\bweek\s*\(", "weekofyear(", q)
        q = re.sub(r"(?i)\bis_null\s*\(", "isnull(", q)
        q = _rewrite_like_match(q)

        # WITH ctes: evaluate and register sequentially (shadowing OK)
        mw = re.match(r"(?is)^\s*WITH\s+(.*)$", q)
        if mw:
            rest2 = mw.group(1)
            while True:
                mname = re.match(r"(?is)^\s*(\w+)\s+AS\s*\(", rest2)
                if not mname:
                    break
                j = mname.end()
                depth = 1
                while j < len(rest2) and depth:
                    if rest2[j] == "(":
                        depth += 1
                    elif rest2[j] == ")":
                        depth -= 1
                    j += 1
                self._local_tables[mname.group(1).lower()] = self.sql(rest2[mname.end(): j - 1])
                rest2 = rest2[j:].lstrip()
                if rest2.startswith(","):
                    rest2 = rest2[1:]
                else:
                    break
            return self._sql(rest2)

        # anonymous inline windows: OVER ( ... ) → synthetic named windows
        q, anon_defs = _name_inline_windows(q)

        # top-level UNION [ALL|DISTINCT] set operation
        parts = _split_set_union(q)
        if len(parts) > 1:
            dfs = [self._sql(p[0]) for p in parts]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d)
            # OpenMLDB UNION without ALL de-duplicates
            if any(p[1] == "distinct" for p in parts[1:]):
                out = out.distinct()
            return out

        if not re.search(r"(?is)\bFROM\b", q):
            # constant SELECT (no FROM) → Spark SQL directly
            return self.spark.sql(q)
        # pull off the WINDOW clause (to end or before LIMIT)
        mwin = re.search(r"(?is)\bWINDOW\s+(\w+\s+AS\s*\(.*\))\s*(LIMIT\s+\d+)?\s*$", q)
        limit_txt = ""
        win_txt = None
        if mwin:
            win_txt = mwin.group(1)
            limit_txt = mwin.group(2) or ""
            q = q[: mwin.start()].strip()
        if anon_defs:
            win_txt = ", ".join(filter(None, [win_txt] + anon_defs))
            if not limit_txt:
                ml = re.search(r"(?is)\bLIMIT\s+\d+\s*$", q)
                if ml:
                    limit_txt = ml.group(0)
                    q = q[: ml.start()].strip()

        m = re.match(r"(?is)^SELECT\s+(.*?)\s+FROM\s+(.*)$", q)
        if not m:
            raise ValueError(f"unsupported statement: {text!r}")
        select_txt, rest = m.group(1), m.group(2)
        rest = self._inline_subqueries(rest)

        # FROM chain: t0 (LAST JOIN tn [ORDER BY o] ON cond)*
        joins = re.split(r"(?i)\bLAST\s+JOIN\b", rest)
        base_part = joins[0].strip()
        tail_kw = re.search(r"(?is)\b(WHERE|GROUP\s+BY|HAVING|ORDER\s+BY|LIMIT)\b", base_part)
        residual_tail = ""
        if len(joins) == 1 and tail_kw:
            residual_tail = base_part[tail_kw.start():]
            base_part = base_part[: tail_kw.start()].strip()
        toks = base_part.split()
        base_tbl = toks[0].lower()
        df = self._table(base_tbl)
        # optional alias on the base table ("FROM t0 a" / "FROM t0 AS a")
        alias_toks = [t for t in toks[1:] if t.lower() != "as"]
        aliases = [base_tbl] + [a.lower() for a in alias_toks]

        # column map: base table columns keep their names
        self._colmap: dict[tuple[str, str], str] = {}
        self._flat_raw: dict[str, str] = {}  # flattened → original name
        self._bare_map: dict[str, str] = {}  # bare right-col → flattened
        for al in aliases:
            for c in df.columns:
                self._colmap[(al, c.lower())] = c

        for jtxt in joins[1:]:
            jtxt = jtxt.strip()
            mo = re.match(
                r"(?is)^(\w+)(?:\s+(?:AS\s+)?(\w+))?\s*(?:ORDER\s+BY\s+([\w\.]+)(?:\s+(ASC|DESC))?\s*)?ON\s+(.*)$",
                jtxt,
            )
            if not mo:
                raise ValueError(f"cannot parse LAST JOIN: {jtxt!r}")
            rtbl = mo.group(1).lower()
            ralias = mo.group(2).lower() if mo.group(2) and mo.group(2).lower() not in self._KEYWORDS else None
            order_ref, order_dir, cond_txt = mo.group(3), mo.group(4), mo.group(5)
            tail = re.search(r"(?is)\b(WHERE|GROUP\s+BY|HAVING|ORDER\s+BY|LIMIT|LAST\s+JOIN)\b", cond_txt)
            if tail:
                residual_tail = cond_txt[tail.start():]
                cond_txt = cond_txt[: tail.start()]
            right = self._table(rtbl)
            # prefix right columns to avoid collisions; an explicit base
            # alias shadows the right table's real name (id=23)
            prefix = f"{ralias or rtbl}__"
            left_cols_now = {c.lower() for c in df.columns}
            for rname in filter(None, (rtbl, ralias)):
                if rname == rtbl and rname in aliases:
                    continue
                for c in right.columns:
                    self._colmap[(rname, c.lower())] = f"{prefix}{c}"
                    self._flat_raw[f"{prefix}{c}"] = c
            for c in right.columns:
                cl = c.lower()
                if cl in left_cols_now:
                    continue  # left name wins for bare references
                if cl in self._bare_map:
                    self._bare_map.pop(cl, None)  # ambiguous across rights
                else:
                    self._bare_map[cl] = f"{prefix}{c}"

            # split conjunction into equi keys / asof / residual;
            # the right table's real name is shadowed by a base alias
            rnames = {ralias} if (ralias and rtbl in aliases) else ({rtbl} | ({ralias} if ralias else set()))
            eqs, asof_l, asof_r, strict, residual = [], None, None, False, []
            for clause in re.split(r"(?i)\bAND\b", cond_txt):
                cl = clause.strip()
                me = re.fullmatch(r"([\w\.]+)\s*=\s*([\w\.]+)", cl)
                mt = re.fullmatch(r"([\w\.]+)\s*(<=|<)\s*([\w\.]+)", cl)
                if me:
                    a, b = me.group(1), me.group(2)
                    if a.split(".")[0].lower() in rnames:
                        a, b = b, a
                    eqs.append((self._ref_col(a), self._raw_col(b)))
                elif mt and mt.group(1).split(".")[0].lower() in rnames:
                    # "t1.ts <= t0.ts" — point-in-time condition
                    asof_r = self._raw_col(mt.group(1))
                    asof_l = self._strip_tbl(mt.group(3))
                    strict = mt.group(2) == "<"
                else:
                    residual.append(cl)
            order_raw = order_ref.split(".")[-1] if order_ref else None
            # "last" of an ASC iteration is the max; of DESC, the min
            pick = "min" if (order_dir or "").lower() == "desc" else "max"
            if order_raw is None and rtbl in self.index_ts:
                # unordered LAST JOIN follows storage iteration order:
                # newest index-ts first, first match kept ⇒ max index ts
                # (test_lastjoin_simple.yaml id 4-5)
                order_raw = self.index_ts[rtbl]

            cond_col = None
            if residual:
                # non-equi residual conditions ride the join predicate
                # (JoinPlan.scala:112-151); names resolve post-prefix
                cond_col = F.expr(" AND ".join(f"({self._rewrite_refs(c)})" for c in residual))
            # SQL surface uses the row_number strategy uniformly: it
            # keeps right key columns addressable (prefixed) and NULL
            # for unmatched left rows, matching the reference exactly
            df = last_join(
                df,
                right,
                on=[(l, r) for l, r in eqs],
                order_by=order_raw,
                condition=cond_col,
                asof_left_ts=asof_l,
                asof_right_ts=asof_r,
                strict=strict,
                how="shuffle",
                right_prefix=prefix,
                prefix_keys=True,
                pick=pick,
            )

        # WINDOW feature passes
        select_items = _split_top(select_txt)
        win_defs = self._parse_window_defs(win_txt) if win_txt else {}
        plain_items: list[str] = []
        per_window: dict[str, list[Agg]] = {n: [] for n in win_defs}
        tmp_cols: list[tuple[str, str]] = []  # (name, sql expr)
        n_tmp = 0

        input_cols = list(df.columns)

        def _star_items(cols):
            return [
                f"`{c}` AS `{self._flat_raw[c]}`" if c in self._flat_raw else f"`{c}`"
                for c in cols
            ]

        for item in select_items:
            it = item.strip()
            if it == "*" and (win_defs or self._flat_raw):
                # expand in place so window feature columns don't leak
                # in and joined columns keep their original names
                plain_items.extend(_star_items(input_cols))
                continue
            mstar = re.fullmatch(r"(\w+)\.\*", it)
            if mstar:
                tname = mstar.group(1).lower()
                cols = [v for (t, _), v in self._colmap.items() if t == tname]
                # preserve df column order
                cols = [c for c in input_cols if c in set(cols)]
                plain_items.extend(_star_items(cols))
                continue
            body, alias = self._split_alias(item)
            rewritten, calls = _extract_over_calls(body, set(win_defs))
            if not calls:
                expr = self._rewrite_refs(body)
                mcol = re.fullmatch(r"(\w+)\.(\w+)", body.strip())
                mbare = re.fullmatch(r"[A-Za-z_]\w*", body.strip())
                if alias:
                    plain_items.append(f"{expr} AS {alias}")
                elif mcol and expr != mcol.group(2):
                    # unaliased t.col keeps the bare column output name
                    plain_items.append(f"{expr} AS {mcol.group(2)}")
                elif mbare and expr != body.strip():
                    # bare right-table column keeps its original name
                    plain_items.append(f"{expr} AS {body.strip()}")
                elif not re.fullmatch(r"[\w\.]+|\*", body.strip()):
                    # unaliased expressions are named by their (deprefixed)
                    # source text, matching the reference's output naming
                    plain_items.append(f"{expr} AS `{expr.strip()}`")
                else:
                    plain_items.append(expr)
                continue
            single = len(calls) == 1 and rewritten.strip() == f"`{calls[0][3]}`"
            for fname, args_txt, wname, ph, default_name in calls:
                out_name = (alias or default_name) if single else ph
                per_window[wname].append(
                    self._make_agg(fname, _split_top(args_txt), out_name, tmp_cols)
                )
            if single:
                plain_items.append(f"`{alias or calls[0][4]}`")
            else:
                expr = self._rewrite_refs(rewritten)
                plain_items.append(f"{expr} AS {alias}" if alias else expr)

        for name, expr in tmp_cols:
            df = df.withColumn(name, F.expr(expr))

        for wname, aggs in per_window.items():
            if not aggs:
                continue
            wd = win_defs[wname]
            spec = WindowSpec(
                partition_by=wd.partition_by,
                order_by=wd.order_by,
                frame=wd.frame,
                preceding=wd.preceding,
                end_preceding=wd.end_preceding,
                end_is_offset=wd.end_is_offset,
                open_end=wd.open_end,
                open_preceding=wd.open_preceding,
                maxsize=wd.maxsize,
                exclude_current_time=wd.exclude_current_time,
                exclude_current_row=wd.exclude_current_row,
                instance_not_in_window=wd.instance_not_in_window,
            )
            union = [self._resolve_table(t) for t in wd.union_tables] or None
            df = window_agg(df, spec, aggs, union=union)

        # residual ANSI SQL over the enriched frame (unique view name —
        # WINDOW UNION subqueries recurse into sql())
        view = f"__omldb_q_{abs(id(df)) % 100000}__"
        df.createOrReplaceTempView(view)
        residual_tail = self._rewrite_refs(residual_tail.strip())
        final = f"SELECT {', '.join(plain_items)} FROM {view} {residual_tail} {limit_txt}"
        final = _rewrite_where_aggs(final)
        return self.spark.sql(final)

    def _resolve_table(self, name: str) -> DataFrame:
        """Table name or parenthesized subquery (WINDOW UNION allows
        ``UNION (select * from t1)``)."""
        t = name.strip()
        if t.startswith("("):
            saved = (self._colmap, getattr(self, "_bare_map", {}))
            try:
                return self.sql(t[1:-1])
            finally:
                self._colmap, self._bare_map = saved
        return self._table(t)

    def _ref_col(self, ref: str) -> str:
        """left-side reference → flattened name"""
        return self._strip_tbl(ref)

    def _raw_col(self, ref: str) -> str:
        """right-side reference → raw (pre-prefix) column name"""
        return ref.split(".")[-1]

    def _split_alias(self, item: str) -> tuple[str, str | None]:
        """Split a trailing top-level ``AS alias`` (not CAST(x AS t))."""
        depth = 0
        low = item.lower()
        for i in range(len(item) - 1, 2, -1):
            ch = item[i]
            if ch == ")":
                depth += 1
            elif ch == "(":
                depth -= 1
            elif depth == 0 and low[i - 3:i + 1].endswith(" as ") and i - 3 >= 0:
                tail = item[i + 1:].strip()
                if re.fullmatch(r"\w+", tail):
                    return item[: i - 3].strip(), tail
        return item.strip(), None

    def _make_agg(self, fname: str, args: list[str], alias: str, tmp_cols: list) -> Agg:
        col = cond = cate = None
        nlag = 1
        param = 0.5
        if fname == "count" and args == ["*"]:
            col = None
        elif fname.endswith("_where"):
            col = self._expr_col(args[0], tmp_cols)
            cond_expr = self._rewrite_refs(args[1])
            cond = f"__tmp{len(tmp_cols)}__"
            tmp_cols.append((cond, f"CAST(({cond_expr}) AS BOOLEAN)"))
        elif fname.endswith("_cate"):
            col = self._expr_col(args[0], tmp_cols)
            cate = self._expr_col(args[1], tmp_cols)
        elif fname in ("lag", "at", "top", "topn_frequency"):
            col = self._expr_col(args[0], tmp_cols)
            nlag = int(args[1]) if len(args) > 1 else 1
        elif fname == "ew_avg":
            col = self._expr_col(args[0], tmp_cols)
            param = float(args[1]) if len(args) > 1 else 0.5
        else:
            col = self._expr_col(args[0], tmp_cols) if args and args[0] != "*" else None
        return Agg(fname, col, alias, cond=cond, cate=cate, n=nlag, param=param)

    def _expr_col(self, arg: str, tmp_cols: list) -> str:
        """Aggregate argument → column name (plain col passes through,
        expressions become precomputed temp columns)."""
        a = arg.strip()
        if re.fullmatch(r"[\w\.]+", a):
            return self._strip_tbl(a)
        name = f"__tmp{len(tmp_cols)}__"
        tmp_cols.append((name, self._rewrite_refs(a)))
        return name
