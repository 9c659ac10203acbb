"""Driver-side parsing micro-operators.

Fresh implementations of the parsing behaviors inventoried in SURVEY §2.9:
MySQL enum/set value lists with escapes (reference mysql_enumset.go:8-58),
``type(N)`` length extraction (reference source_mysql.go:498-514), SQLite
declared-type parameter parsing (reference source_sqlite.go:737-754), the SQL
statement splitter with dollar-quoting (reference hooks.go:42-165), and the
MSSQL balanced-paren stripper (reference source_mssql.go:819-842).
"""

from __future__ import annotations

import re


def parse_enum_values(column_type: str) -> list[str]:
    """Parse ``enum('a','b''c','d\\'e')`` / ``set(...)`` into its value list.

    Handles `''` doubling and backslash escapes inside values.
    """
    m = re.match(r"^\s*(enum|set)\s*\((.*)\)\s*$", column_type, re.IGNORECASE | re.DOTALL)
    if not m:
        raise ValueError(f"not an enum/set type: {column_type!r}")
    body = m.group(2)
    values: list[str] = []
    i, n = 0, len(body)
    while i < n:
        while i < n and body[i] in " \t\n,":
            i += 1
        if i >= n:
            break
        if body[i] != "'":
            raise ValueError(f"malformed enum/set body at {i}: {column_type!r}")
        i += 1
        buf: list[str] = []
        while i < n:
            ch = body[i]
            if ch == "\\" and i + 1 < n:
                buf.append(body[i + 1])
                i += 2
            elif ch == "'":
                if i + 1 < n and body[i + 1] == "'":
                    buf.append("'")
                    i += 2
                else:
                    i += 1
                    break
            else:
                buf.append(ch)
                i += 1
        values.append("".join(buf))
    return values


_TYPE_LEN_RE = re.compile(r"^\s*[a-zA-Z_ ]+\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)")


def parse_type_length(column_type: str) -> int | None:
    """Extract N from ``varchar(N)`` / ``bit(N)`` / ``binary(N)`` declarations."""
    m = _TYPE_LEN_RE.match(column_type)
    return int(m.group(1)) if m else None


def parse_precision_scale(column_type: str) -> tuple[int | None, int | None]:
    """Extract (p, s) from ``decimal(p[,s])``-style declarations."""
    m = _TYPE_LEN_RE.match(column_type)
    if not m:
        return None, None
    p = int(m.group(1))
    s = int(m.group(2)) if m.group(2) is not None else None
    return p, s


def strip_balanced_parens(expr: str) -> str:
    """Strip balanced *outer* parentheses from an MSSQL default expression:
    ``((1))`` → ``1``, ``(getdate())`` → ``getdate()``, but
    ``(a)+(b)`` stays intact."""
    s = expr.strip()
    while len(s) >= 2 and s[0] == "(" and s[-1] == ")":
        depth = 0
        balanced_outer = True
        for i, ch in enumerate(s):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i != len(s) - 1:
                    balanced_outer = False
                    break
        if not balanced_outer:
            break
        s = s[1:-1].strip()
    return s


def split_sql_statements(sql: str) -> list[str]:
    """Split a SQL script on top-level ``;`` while respecting:

    * ``-- line comments``
    * nested ``/* block /* comments */ */``
    * ``'...'`` and ``"..."`` quoting with ``''`` / ``""`` doubling
    * ``$$..$$`` and ``$tag$..$tag$`` dollar quoting

    Comments are preserved inside statements; empty statements dropped.
    """
    stmts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        nxt = sql[i + 1] if i + 1 < n else ""
        if ch == "-" and nxt == "-":
            j = sql.find("\n", i)
            j = n if j < 0 else j + 1
            buf.append(sql[i:j])
            i = j
        elif ch == "/" and nxt == "*":
            depth = 1
            j = i + 2
            while j < n and depth > 0:
                if sql[j] == "/" and j + 1 < n and sql[j + 1] == "*":
                    depth += 1
                    j += 2
                elif sql[j] == "*" and j + 1 < n and sql[j + 1] == "/":
                    depth -= 1
                    j += 2
                else:
                    j += 1
            buf.append(sql[i:j])
            i = j
        elif ch in ("'", '"'):
            quote = ch
            j = i + 1
            while j < n:
                if sql[j] == quote:
                    if j + 1 < n and sql[j + 1] == quote:
                        j += 2
                    else:
                        j += 1
                        break
                else:
                    j += 1
            buf.append(sql[i:j])
            i = j
        elif ch == "$":
            m = re.match(r"\$([A-Za-z_][A-Za-z0-9_]*)?\$", sql[i:])
            if m:
                tag = m.group(0)
                end = sql.find(tag, i + len(tag))
                j = n if end < 0 else end + len(tag)
                buf.append(sql[i:j])
                i = j
            else:
                buf.append(ch)
                i += 1
        elif ch == ";":
            stmt = "".join(buf).strip()
            if stmt and not _is_only_comments(stmt):
                stmts.append(stmt)
            buf = []
            i += 1
        else:
            buf.append(ch)
            i += 1
    stmt = "".join(buf).strip()
    if stmt and not _is_only_comments(stmt):
        stmts.append(stmt)
    return stmts


def _is_only_comments(stmt: str) -> bool:
    s = stmt.strip()
    while s:
        if s.startswith("--"):
            j = s.find("\n")
            if j < 0:
                return True
            s = s[j + 1 :].strip()
        elif s.startswith("/*"):
            depth, j = 1, 2
            while j < len(s) and depth > 0:
                if s[j : j + 2] == "/*":
                    depth += 1
                    j += 2
                elif s[j : j + 2] == "*/":
                    depth -= 1
                    j += 2
                else:
                    j += 1
            s = s[j:].strip()
        else:
            return False
    return True


def sqlite_normalize_affinity(declared: str) -> str:
    """SQLite type-affinity extraction (reference source_sqlite.go:724-735):
    the *declared* type decides affinity; missing/unknown → BLOB affinity."""
    t = declared.strip().upper()
    if not t:
        return "BLOB"
    if "INT" in t:
        return "INTEGER"
    if any(k in t for k in ("CHAR", "CLOB", "TEXT")):
        return "TEXT"
    if "BLOB" in t:
        return "BLOB"
    if any(k in t for k in ("REAL", "FLOA", "DOUB")):
        return "REAL"
    return "NUMERIC"
