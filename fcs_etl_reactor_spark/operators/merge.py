"""Upsert/merge maintenance operator (the MERGE INTO shape, table-
format-agnostic): apply a batch of keyed updates to a base relation.

Scale: the only shuffle is the anti-join on the merge key; when the
update batch is bounded (the normal CDC case) Spark broadcasts it and
the base table never shuffles at all. With a lakehouse table format
you'd push this to the format's MERGE; this operator is the engine-
level semantics those formats implement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(base: DataFrame, updates: DataFrame, key_cols: list[str]) -> DataFrame:
    """Rows of `updates` win on key collision; unmatched base rows pass
    through; new keys in `updates` append. Column sets must match."""
    assert set(base.columns) == set(updates.columns), "schema mismatch"
    survivors = base.join(updates.select(*key_cols), key_cols, "left_anti")
    return updates.unionByName(survivors)


# --------------------------------------------------------------------------
# MERGE INTO SQL surface. Vanilla Spark only executes MERGE against a
# v2 table with a merge-capable catalog (Delta/Iceberg); none ships in
# this environment, so the statement surface is implemented HERE and
# lowered to the same relational algebra `merge_upsert` uses — exactly
# what those formats do underneath. The result is returned as a
# DataFrame (the post-merge table contents) rather than written: the
# write half is a sink concern (io.py), the MERGE semantics are the
# engine concern.
#
# Supported grammar (a deliberate, documented subset — anything else
# raises ValueError, never a silent misparse):
#
#   MERGE INTO <table> [AS] <t>
#   USING <table> [AS] <s>  |  USING ( <subquery> ) [AS] <s>
#   ON <condition>
#   { WHEN MATCHED [AND <cond>] THEN UPDATE SET col = expr, ...
#   | WHEN MATCHED [AND <cond>] THEN DELETE }...
#   [ WHEN NOT MATCHED [BY TARGET] [AND <cond>] THEN
#       INSERT *  |  INSERT (col, ...) VALUES (expr, ...) ]
#   { WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN
#       UPDATE SET col = expr, ...  |  DELETE }...
#
# ANSI clause semantics: for each matched (t, s) pair the FIRST
# matched-clause whose TRUE condition holds fires (update or delete);
# a matched row with no firing clause passes through unchanged. The
# same first-TRUE-wins cascade applies to the NOT MATCHED BY SOURCE
# clauses over target rows with no source match (their conditions and
# SET expressions may reference only target columns). A columns-list
# INSERT leaves unlisted target columns NULL; at most one insert
# clause is accepted (multi-insert dispatch is not in the subset).
# Parser limits (documented, error-or-correct — never misparse):
# clause boundaries split on top-level WHEN, so a CASE WHEN inside
# the ON condition or a SET expression must be parenthesized;
# SET values are cast to the target column's type (the lakehouse
# formats' coercion behavior).
# Contract (same as the lakehouse formats): each target row may match
# at most one source row — a multi-match source makes MERGE
# ill-defined. Under violation the dispositions diverge: the matched
# cascade (inner join) would DUPLICATE the target row once per source
# match, while the no-matched-clause pass-through (left_semi) silently
# DEDUPES it — and ANSI/Delta raise a cardinality error instead. The
# contract is the caller's schema invariant by default; set
# SPARK_GRAFT_MERGE_CHECK=1 to pay one extra aggregation and get the
# ANSI-style error on violation (debug/CI switch, off on the 100 TB
# hot path where the source is a keyed CDC batch by construction).
# --------------------------------------------------------------------------


def _scan_parens(sql: str, start: int) -> int:
    """Index just past the ')' matching the '(' at `start` (depth
    count; single-quoted literals are opaque)."""
    depth, i, n = 0, start, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            i = _skip_literal(sql, i)
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("MERGE: unbalanced parentheses in USING subquery")


def _skip_literal(sql: str, quote_at: int) -> int:
    """Index of the closing quote of the literal opening at `quote_at`
    (MERGE-prefixed error on an unclosed literal)."""
    try:
        return sql.index("'", quote_at + 1)
    except ValueError:
        raise ValueError(
            f"MERGE: unclosed string literal in: {sql[quote_at:][:60]!r}"
        ) from None


def _find_top_level(sql: str, keyword: str) -> "re.Match | None":
    """First word-bounded, any-case match of `keyword` at paren-depth 0
    (single-quoted literals are opaque, same scanner as _split_top_level).
    Used to locate the top-level THEN inside a WHEN clause so the AND
    condition is everything before it BY CONSTRUCTION — never by regex
    backtracking, which a condition literal containing ' THEN ...'
    could otherwise steer to the wrong THEN."""
    import re

    depth = 0
    for m in re.finditer(r"'[^']*'|[()]|\b" + keyword + r"\b", sql, re.I):
        tok = m.group(0)
        if tok.startswith("'"):
            continue
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            return m
    return None


def _split_top_level(sql: str, keyword: str) -> list[str]:
    """Split on a keyword at paren-depth 0 (word-bounded, any case;
    single-quoted literals are opaque, same as _scan_parens)."""
    import re

    # the literal alternative comes first so a WHEN/paren inside quotes
    # is consumed as part of the literal token and never counted
    parts, depth, last = [], 0, 0
    for m in re.finditer(r"'[^']*'|[()]|\b" + keyword + r"\b", sql, re.I):
        tok = m.group(0)
        if tok.startswith("'"):
            continue
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            parts.append(sql[last : m.start()])
            last = m.end()
    parts.append(sql[last:])
    return parts


def merge_into_sql(spark, sql: str) -> DataFrame:
    """Parse and execute a MERGE INTO statement (grammar above)
    against registered views/tables; returns the merged relation.

    Lowering: one join per disposition on the raw ON condition —
    inner (matched: first-TRUE-wins case-cascade per target column),
    left_anti from target (not-matched-by-source: pass-through, or the
    same cascade when BY SOURCE clauses exist), left_anti from source
    (INSERT, star or columns-list) — so the physical cost is the q7b
    shape: a single shuffle (or broadcast, when the source is bounded)
    on the merge key, nothing rewriting untouched rows.
    """
    import re

    from pyspark.sql import functions as F

    if sql.count("'") % 2:
        raise ValueError("MERGE: unclosed string literal")
    m = re.match(
        r"\s*MERGE\s+INTO\s+(\w+)\s+(?:AS\s+)?(\w+)\s+USING\s+", sql, re.I
    )
    if not m:
        raise ValueError("MERGE: expected 'MERGE INTO <table> [AS] <alias> USING'")
    tgt_name, t_alias = m.group(1), m.group(2)
    rest = sql[m.end() :]
    if rest.lstrip().startswith("("):
        open_at = len(rest) - len(rest.lstrip())
        end = _scan_parens(rest, open_at)
        source = spark.sql(rest[open_at + 1 : end - 1])
        rest = rest[end:]
    else:
        m2 = re.match(r"\s*(\w+)", rest)
        if not m2:
            raise ValueError("MERGE: expected source table or (subquery) after USING")
        source = spark.table(m2.group(1))
        rest = rest[m2.end() :]
    m3 = re.match(r"\s*(?:AS\s+)?(\w+)\s+ON\s+", rest, re.I)
    if not m3:
        raise ValueError("MERGE: expected '[AS] <alias> ON <condition>'")
    s_alias = m3.group(1)
    whens = _split_top_level(rest[m3.end() :], "WHEN")
    on_sql = whens[0].strip()
    if not on_sql or len(whens) < 2:
        raise ValueError("MERGE: expected ON condition followed by WHEN clauses")

    matched_clauses: list[tuple[str | None, str, dict[str, str] | None]] = []
    by_source_clauses: list[tuple[str | None, str, dict[str, str] | None]] = []
    insert_clause: tuple[str | None, list[str] | None, list[str] | None] | None = None
    for clause in whens[1:]:
        c = clause.strip()
        # split at the TOP-LEVEL THEN first (quote/paren-opaque scan),
        # so the optional AND condition is the text between the
        # disposition keywords and THEN by construction — a condition
        # literal containing ' THEN UPDATE ...' cannot misdirect the
        # parse the way regex backtracking over .*?THEN could
        tm = _find_top_level(c, "THEN")
        if tm is None:
            raise ValueError(f"MERGE: WHEN clause lacks THEN: WHEN {c[:80]}")
        head, action = c[: tm.start()].strip(), c[tm.end() :].strip()

        def _cond(prefix_re: str) -> tuple[bool, str | None]:
            """Match head against a disposition prefix + optional AND
            condition; returns (matched, condition-or-None)."""
            mm = re.match(prefix_re + r"(?:\s+AND\s+(.*))?\s*$", head, re.I | re.S)
            return (mm is not None, mm.group(1) if mm else None)

        def _upsert_action() -> tuple[str, dict[str, str] | None]:
            ma = re.match(r"UPDATE\s+SET\s+(.*)$", action, re.I | re.S)
            if ma:
                return "update", _parse_set_list(ma.group(1))
            if re.fullmatch(r"DELETE", action, re.I):
                return "delete", None
            raise ValueError(
                f"MERGE: expected UPDATE SET ... or DELETE after THEN: {action[:60]}"
            )

        hit, cond = _cond(r"MATCHED")
        if hit:
            matched_clauses.append((cond, *_upsert_action()))
            continue
        hit, cond = _cond(r"NOT\s+MATCHED\s+BY\s+SOURCE")
        if hit:
            by_source_clauses.append((cond, *_upsert_action()))
            continue
        hit, cond = _cond(r"NOT\s+MATCHED(?:\s+BY\s+TARGET)?")
        if hit:
            ma = re.match(r"INSERT\s+(.*?)\s*$", action, re.I | re.S)
            if not ma:
                raise ValueError(
                    f"MERGE: expected INSERT after NOT MATCHED THEN: {action[:60]}"
                )
            if insert_clause is not None:
                raise ValueError(
                    "MERGE: at most one WHEN NOT MATCHED ... INSERT clause"
                )
            insert_clause = (cond, *_parse_insert_payload(ma.group(1)))
            continue
        raise ValueError(f"MERGE: unsupported WHEN clause: WHEN {c[:80]}")

    t = spark.table(tgt_name).alias(t_alias)
    s = source.alias(s_alias)
    on = F.expr(on_sql)
    tschema = spark.table(tgt_name).schema
    tcols = tschema.fieldNames()

    import os

    if os.environ.get("SPARK_GRAFT_MERGE_CHECK"):
        # opt-in ANSI-style cardinality check (one extra inner join +
        # agg): each target row may match at most one source row —
        # under violation the matched cascade duplicates while the
        # semi pass-through dedupes, so fail loudly instead of picking
        tid = (
            spark.table(tgt_name)
            .withColumn("__tid", F.monotonically_increasing_id())
            .alias(t_alias)
        )
        dup = (
            tid.join(s, on, "inner")
            .groupBy("__tid")
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError(
                "MERGE: a target row matches more than one source row "
                "(ill-defined under ANSI/Delta semantics; dedupe the "
                "source on the merge key first)"
            )

    def base_col(col: str):
        return F.col(f"{t_alias}.{col}")

    if not matched_clauses and not by_source_clauses:
        # INSERT-only MERGE: no clause rewrites anything, so EVERY
        # target row passes through unchanged (the anti-join + matched
        # split below exists only to rewrite rows; the anti-join alone
        # would silently drop matched rows)
        parts = [t.select(*tcols)]
    else:
        anti = t.join(s, on, "left_anti")  # not matched by source
        parts = [
            _cascade(anti, by_source_clauses, tcols, tschema, base_col)
            if by_source_clauses
            else anti.select(*tcols)
        ]
        if matched_clauses:
            parts.append(
                _cascade(
                    t.join(s, on, "inner"), matched_clauses, tcols, tschema,
                    base_col,
                )
            )
        else:
            # matched rows with no matched clause pass through; the
            # at-most-one-source-match contract makes semi exact here
            parts.append(t.join(s, on, "left_semi").select(*tcols))
    if insert_clause is not None:
        ins_cond, ins_cols, ins_vals = insert_clause
        new_rows = s.join(t, on, "left_anti")
        if ins_cond:
            new_rows = new_rows.filter(
                F.coalesce(F.expr(ins_cond), F.lit(False))
            )
        if ins_cols is None:  # INSERT *
            missing = [c for c in tcols if c not in source.columns]
            if missing:
                raise ValueError(
                    f"MERGE: INSERT * source lacks target columns {missing}"
                )
            parts.append(new_rows.select(*tcols))
        else:
            bad = [c for c in ins_cols if c not in tcols]
            if bad:
                raise ValueError(f"MERGE: INSERT columns not in target: {bad}")
            if len(set(ins_cols)) != len(ins_cols):
                raise ValueError("MERGE: duplicate INSERT column")
            vals = dict(zip(ins_cols, ins_vals))
            parts.append(
                new_rows.select(
                    *[
                        (
                            F.expr(vals[col])
                            if col in vals
                            else F.lit(None)  # unlisted target col -> NULL
                        )
                        .cast(tschema[col].dataType)
                        .alias(col)
                        for col in tcols
                    ]
                )
            )

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _cascade(df, clauses, tcols, tschema, base_col) -> DataFrame:
    """First-TRUE-wins UPDATE/DELETE cascade (ANSI WHEN semantics) over
    one disposition's rows; rows firing no clause pass through."""
    from pyspark.sql import functions as F

    remaining = F.lit(True)
    branches = []  # (fires, action, sets)
    for cond, action, sets in clauses:
        # ANSI: a clause fires only when its condition is TRUE — a
        # NULL condition must fall through to the next clause, not
        # poison the filter/when chain, so coalesce it to false
        c = F.coalesce(F.expr(cond), F.lit(False)) if cond else F.lit(True)
        branches.append((remaining & c, action, sets))
        remaining = remaining & ~c
    kept = df
    for fires, action, _ in branches:
        if action == "delete":
            kept = kept.filter(~fires)
    out_cols = []
    for col in tcols:
        expr = None
        for fires, action, sets in branches:
            if action == "update" and sets and col in sets:
                val = F.expr(sets[col]).cast(tschema[col].dataType)
                expr = (
                    F.when(fires, val) if expr is None else expr.when(fires, val)
                )
        base = base_col(col)
        out_cols.append(
            (expr.otherwise(base) if expr is not None else base).alias(col)
        )
    return kept.select(*out_cols)


def _parse_insert_payload(
    payload: str,
) -> tuple[list[str] | None, list[str] | None]:
    """Parse the text after INSERT: `*` -> (None, None); `(col, ...)
    VALUES (expr, ...)` -> (cols, exprs). Anything else errors."""
    import re

    p = payload.strip()
    if p == "*":
        return None, None
    if not p.startswith("("):
        raise ValueError(f"MERGE: expected INSERT * or (columns): {p[:60]}")
    end = _scan_parens(p, 0)
    cols = _split_top_commas(p[1:end - 1])
    if not all(re.fullmatch(r"\w+", c) for c in cols):
        raise ValueError(f"MERGE: bad INSERT column list: {p[:end]}")
    rest = p[end:].lstrip()
    mv = re.match(r"VALUES\s*", rest, re.I)
    if not mv or not rest[mv.end():].startswith("("):
        raise ValueError("MERGE: expected VALUES (...) after INSERT columns")
    rest = rest[mv.end():]
    end2 = _scan_parens(rest, 0)
    if rest[end2:].strip():
        raise ValueError(
            f"MERGE: trailing text after INSERT VALUES: {rest[end2:][:60]}"
        )
    vals = _split_top_commas(rest[1:end2 - 1])
    if len(vals) != len(cols):
        raise ValueError(
            f"MERGE: INSERT lists {len(cols)} columns but {len(vals)} values"
        )
    return cols, vals


def _split_top_commas(sql: str) -> list[str]:
    """Split on commas at paren-depth 0, stripped (single-quoted
    literals are opaque, same as _scan_parens)."""
    items, depth, last, i, n = [], 0, 0, 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            i = _skip_literal(sql, i)
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            items.append(sql[last:i])
            last = i + 1
        i += 1
    items.append(sql[last:])
    return [s.strip() for s in items]


def _parse_set_list(set_sql: str) -> dict[str, str]:
    """Parse 'a = expr, b = expr' (comma split at paren-depth 0)."""
    import re

    sets: dict[str, str] = {}
    for item in _split_top_commas(set_sql):
        mm = re.match(r"\s*(\w+)\s*=\s*(.+?)\s*$", item, re.S)
        if not mm:
            raise ValueError(f"MERGE: bad SET item: {item!r}")
        sets[mm.group(1)] = mm.group(2)
    return sets
