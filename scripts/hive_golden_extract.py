"""Extract Hive-compatibility golden entries from the reference's PUBLIC
Apache Hive test resources (sql/hive/src/test/resources: the .q query
texts under ql/src/test/queries/clientpositive and their recorded golden
outputs under golden/) into tests/hive_golden_data2.py.

Round 9 pinned 244 statements from 13 families by hand; this script is
the reproducible version of that pipeline (VERDICT r9 "keep sampling
opportunistically") for a second tranche of families:

- statements are aligned to goldens BY CONTENT HASH: golden files are
  named <family>-<idx>-<md5(statement)>, so a statement is included only
  when its md5 resolves to golden file(s), and excluded when the same
  hash maps to goldens with DIFFERENT content (the statement ran under
  different `set` options — context-dependent output);
- only SELECT statements are pinned (EXPLAIN/DESCRIBE output is
  engine-specific; DDL/DML become table setup instead);
- CREATE TABLE + LOAD DATA become FAMILY_TABLES2 rows (parsed from the
  public data/files payloads, field-delimited, '\\N'/empty = NULL);
  CREATE TABLE AS SELECT / first INSERT OVERWRITE become SETUP_SQL2
  views; a family needing multi-insert accumulation is skipped whole.

Usage: python scripts/hive_golden_extract.py fam1 fam2 ... > /tmp/out.py
"""

from __future__ import annotations

import glob
import hashlib
import os
import re
import sys

REF = "/root/reference/sql/hive/src/test/resources"
QDIR = os.path.join(REF, "ql/src/test/queries/clientpositive")
GOLD = os.path.join(REF, "golden")
DATA = os.path.join(REF, "data/files")

_TYPE_MAP = {
    "int": "int", "integer": "int", "bigint": "bigint", "smallint": "int",
    "tinyint": "int", "string": "string", "double": "double",
    "float": "float", "boolean": "boolean",
}


def split_statements(text: str) -> list[str]:
    """Split a .q file into statements on top-level ';' (comment lines
    stripped; quotes respected)."""
    lines = [ln for ln in text.splitlines() if not ln.strip().startswith("--")]
    text = "\n".join(lines)
    out, cur, quote = [], [], None
    for ch in text:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in ("'", '"'):
            quote = ch
            cur.append(ch)
            continue
        if ch == ";":
            s = "".join(cur).strip()
            if s:
                out.append(s)
            cur = []
            continue
        cur.append(ch)
    s = "".join(cur).strip()
    if s:
        out.append(s)
    return out


# Statements pinned to Hive behaviors this engine DELIBERATELY diverges
# from (each a documented modern-Spark design decision, not a gap):
EXCLUDED_MD5 = {
    # Spark parses bare decimal literals as DECIMAL (exact), Hive as
    # DOUBLE — round(125.315) prints 125 (decimal) vs Hive's 125.0
    "441d0075081ae87579c959d714c4922d": "decimal-literal typing",
    "4658ec3bc034b43e0477bf2474939449": "decimal-literal typing",
    # FLOAT results: Hive prints Java Float.toString (shortest float32
    # round-trip, 6.8899984); Python renders the same float32 through
    # double expansion — display-only, the DOUBLE/DECIMAL variants of
    # the same statement are pinned
    "798ef5064b61d0ae403e3e11c8fd749b": "float32 display",
    # radians(57.2958): Spark parses the bare literal as DECIMAL and
    # casts to double, landing 1 ulp off Hive's double-literal compute —
    # same root cause as the decimal-literal typing exclusions
    "cb8462f25c18b7405c41a50e52476d04": "decimal-literal typing (1 ulp)",
    # minute/second('2009-08-07'): Hive returns NULL for a date-only
    # string, Spark parses it as midnight (documented modern behavior)
    "270055c684846e87444b037226cf554c": "date-only string: NULL vs midnight",
    "2496e4d3c64ca028184431c2930d82cf": "date-only string: NULL vs midnight",
    # 'face''book' is adjacent-literal CONCATENATION in Hive (facebook)
    # but a doubled-quote ESCAPE (face'book) in Spark/ANSI — a
    # deliberate modern-Spark parser divergence
    "2cf4b7268b47246afdf6c792acca379d": "adjacent string-literal concat",
    # per-branch ORDER BY/LIMIT inside UNION ALL without parentheses:
    # Hive binds them to the branch; Spark requires parens (ANSI)
    "8272225744e83ba4cbe158a5c113fce3": "unparenthesized union branch limit",
}
# Hive-only SYNTAX Spark's parser rejects outright: the FROM-first
# nested form ("FROM ( FROM src SELECT ... )") and script TRANSFORM
# pipelines ("SELECT TRANSFORM(...) USING 'cat'" — the USING anchor
# keeps Spark's legitimate higher-order transform(array, x -> ...)
# pinnable). Families leaning on them are skipped whole — transpiling
# them would pin the transpiler, not the engine.
_FROM_FIRST = re.compile(r"from\s*\(\s*from\b", re.I)
_SCRIPT_TRANSFORM = re.compile(r"transform\s*\(", re.I)
_USING_SCRIPT = re.compile(r"\busing\s+'", re.I)


def _hive_only_syntax(low: str) -> bool:
    if _FROM_FIRST.search(low):
        return True
    return bool(_SCRIPT_TRANSFORM.search(low) and _USING_SCRIPT.search(low))
# Whole families excluded with cause:
EXCLUDED_FAMILIES = {
    # FIELD() is a MySQL-ism Hive ships and Spark deliberately does not
    # (ELT/ARRAY_POSITION cover it); every statement leans on it
    "udf_field": "no FIELD() builtin in Spark",
    # the .q file DROPs and REDEFINES dest1 mid-file (int column, then
    # string + LOAD) — the extractor's flat table/setup model registers
    # one definition per name, so the second half would read the first
    # half's view
    "udf_length": "mid-file table redefinition",
}
# hash() is murmur3 in Spark (2.0+, the bucketing hash) by design;
# goldens for sum(hash(...)) probes record Hive's Java-hashCode UDF —
# values can never match, and the probe checks the JOIN result only
# through the hash, so nothing else in the statement is verifiable.
_HASH_PROBE = re.compile(r"\bhash\s*\(", re.I)


def golden_for(family: str, stmt: str) -> list[str] | None:
    """Golden output lines for a statement, or None if no golden /
    inconsistent goldens (same text under different set-options)."""
    h = hashlib.md5(stmt.encode()).hexdigest()
    hits = sorted(glob.glob(os.path.join(GOLD, f"{family}-*-{h}")))
    if not hits:
        return None
    contents = [open(p, encoding="utf-8", errors="replace").read()
                for p in hits]
    if len(set(contents)) != 1:
        return None  # context-dependent output: excluded
    body = contents[0]
    return sorted(ln for ln in body.split("\n") if ln != "")


def parse_create(stmt: str):
    """(table, schema_str, delimiter) for CREATE TABLE t (cols...)."""
    m = re.match(
        r"create\s+table\s+(?:if\s+not\s+exists\s+)?(\w+)\s*\((.*?)\)\s*(.*)",
        stmt, re.I | re.S,
    )
    if not m:
        return None
    name, cols_raw, tail = m.group(1), m.group(2), m.group(3)
    if re.search(r"partitioned\s+by", tail, re.I):
        return None  # partitioned targets: out of scope for this tranche
    cols = []
    for c in cols_raw.split(","):
        parts = c.split()
        if len(parts) < 2:
            return None
        ty = _TYPE_MAP.get(parts[1].lower())
        if ty is None:
            return None  # complex type: skip family
        cols.append(f"{parts[0].strip('`')} {ty}")
    delim = "\x01"
    dm = re.search(r"terminated\s+by\s+'([^']*)'", tail, re.I)
    if dm:
        delim = dm.group(1).encode().decode("unicode_escape")
    return name, ", ".join(cols), delim


def load_rows(path: str, schema_str: str, delim: str) -> list[tuple]:
    types = [c.split()[1] for c in schema_str.split(", ")]
    rows = []
    for ln in open(path, encoding="utf-8", errors="replace").read().split("\n"):
        if ln == "":
            continue
        vals = ln.split(delim)
        row = []
        for i, ty in enumerate(types):
            v = vals[i] if i < len(vals) else None
            if v in (None, "", "\\N"):
                row.append(None)
            elif ty in ("int", "bigint"):
                try:
                    row.append(int(v))
                except ValueError:
                    row.append(None)  # Hive lenient cast: bad int -> NULL
            elif ty in ("double", "float"):
                try:
                    row.append(float(v))
                except ValueError:
                    row.append(None)
            elif ty == "boolean":
                row.append(v.lower() == "true")
            else:
                row.append(v)
        rows.append(tuple(row))
    return rows


def _insert_from(sel: str, head: str) -> str:
    """Rewrite Hive's "FROM x INSERT OVERWRITE TABLE t SELECT cols
    [WHERE/GROUP BY/...]" into a plain SELECT: the FROM clause goes
    BEFORE the first top-level trailing clause, not at the end."""
    kw = re.compile(
        r"(where|group\s+by|order\s+by|sort\s+by|cluster\s+by|"
        r"distribute\s+by|limit)\b", re.I)
    depth = 0
    for i, ch in enumerate(sel):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and kw.match(sel, i):
            return f"{sel[:i]} {head} {sel[i:]}"
    return f"{sel} {head}"


def src1_rows() -> list[tuple]:
    """TestHive's src1 fixture (kv3.txt as key INT, value STRING —
    reference TestHive.scala:314-316): '' casts to NULL for INT, a
    missing second field is NULL."""
    rows = []
    for ln in open(os.path.join(DATA, "kv3.txt")).read().split("\n"):
        if ln == "":
            continue
        parts = ln.split("\x01")
        k = parts[0] if parts else ""
        v = parts[1] if len(parts) > 1 else None
        try:
            ki = int(k)
        except ValueError:
            ki = None
        rows.append((ki, v))
    return rows


def extract_family(family: str):
    if family in EXCLUDED_FAMILIES:
        return None, EXCLUDED_FAMILIES[family]
    qfile = os.path.join(QDIR, f"{family}.q")
    if not os.path.exists(qfile):
        return None, f"no .q file"
    tables: dict[str, tuple[str, list[tuple]]] = {}
    delims: dict[str, str] = {}
    setup: list[tuple[str, str]] = []
    entries: list[tuple[str, str, list[str]]] = []
    written: set[str] = set()
    for stmt in split_statements(open(qfile).read()):
        low = stmt.lower()
        first = low.split(None, 1)[0] if low.split() else ""
        if first in ("select", "with", "insert", "from") and \
                _hive_only_syntax(low):
            return None, "hive-only FROM-first/TRANSFORM syntax"
        if first in ("set", "explain", "describe", "desc", "show", "analyze",
                     "drop", "reset", "add", "alter", "use", "dfs"):
            continue
        if first == "create":
            if re.match(r"create\s+(temporary\s+)?(function|view|index|database)",
                        low):
                return None, "create function/view/index: skipped"
            m = re.match(
                r"create\s+table\s+(?:if\s+not\s+exists\s+)?(\w+)"
                r"(?:\s+stored.*?)?\s+as\s+select", low, re.S)
            if m:  # CTAS -> setup view
                name = m.group(1)
                sel = stmt[stmt.lower().index("select"):]
                setup.append((name, sel, None))
                continue
            parsed = parse_create(stmt)
            if parsed is None:
                return None, f"unsupported CREATE: {stmt[:60]!r}"
            name, schema, delim = parsed
            tables[name] = (schema, [])
            delims[name] = delim
            continue
        if first == "load":
            m = re.match(
                r"load\s+data\s+local\s+inpath\s+'([^']+)'\s+"
                r"(overwrite\s+)?into\s+table\s+(\w+)", low)
            if not m or m.group(3) not in tables:
                return None, f"unsupported LOAD: {stmt[:60]!r}"
            name = m.group(3)
            path = os.path.join(DATA, os.path.basename(m.group(1)))
            if not os.path.exists(path):
                return None, f"payload missing: {path}"
            schema, rows = tables[name]
            new = load_rows(path, schema, delims[name])
            tables[name] = (schema, (new if m.group(2) else rows + new))
            continue
        if first in ("insert", "from"):
            m = re.search(r"insert\s+overwrite\s+table\s+(\w+)", low)
            if not m:
                return None, f"unsupported DML: {stmt[:60]!r}"
            name = m.group(1)
            if name in written or low.count("insert overwrite") > 1:
                return None, "multi-insert accumulation: skipped"
            written.add(name)
            if "select" not in low:
                return None, f"non-SELECT insert: {stmt[:60]!r}"
            si = stmt.lower().index("select")
            sel = stmt[si:]
            if first == "from":
                head = stmt[:stmt.lower().index("insert")].strip()
                sel = _insert_from(sel, head)
            # declared schema (if CREATEd above): insert takes the
            # declared column names AND types, not the select's
            setup.append((name, sel, tables.get(name, (None,))[0]))
            continue
        if first in ("select", "with"):
            h = hashlib.md5(stmt.encode()).hexdigest()
            if h in EXCLUDED_MD5 or _HASH_PROBE.search(stmt):
                continue
            exp = golden_for(family, stmt)
            if exp is not None:
                entries.append((family, stmt, exp))
            continue
        return None, f"unsupported statement: {stmt[:60]!r}"
    if not entries:
        return None, "no golden-matched SELECTs"
    used = {t for t in tables}
    return {
        "tables": {t: v for t, v in tables.items() if t in used},
        "setup": setup,
        "entries": entries,
    }, None


def main() -> None:
    fams = sys.argv[1:]
    all_tables: dict = {}
    all_setup: dict = {}
    all_entries: list = []
    for fam in fams:
        got, why = extract_family(fam)
        if got is None:
            print(f"-- {fam}: SKIP ({why})", file=sys.stderr)
            continue
        if got["tables"]:
            all_tables[fam] = got["tables"]
        if got["setup"]:
            all_setup[fam] = got["setup"]
        all_entries.extend(got["entries"])
        print(f"-- {fam}: {len(got['entries'])} entries", file=sys.stderr)
    print("SRC1_ROWS =", repr(src1_rows()))
    print("SETUP_SQL2 =", repr(all_setup))
    print("FAMILY_TABLES2 =", repr(all_tables))
    print("ENTRIES2 =", repr(all_entries))
    print(f"-- total {len(all_entries)}", file=sys.stderr)


if __name__ == "__main__":
    main()
