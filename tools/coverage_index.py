#!/usr/bin/env python3
"""Machine-readable operator -> query -> spec index.

Parses COVERAGE.md's section tables and the QueryDef catalog in Queries.scala into
one JSON document (tools/coverage_index.json) so the per-round driver/judge can diff
coverage mechanically instead of re-reading prose:

  python3 tools/coverage_index.py          # regenerate + print summary
  python3 tools/coverage_index.py --check  # exit 1 if the checked-in file is stale

Cross-checks included in the output:
  - unknown_queries:      names COVERAGE.md cites that have no QueryDef (doc rot)
  - unreferenced_queries: QueryDefs no COVERAGE.md row cites (missing doc row)
  - unknown_specs:        spec names cited without a matching src/test file
"""
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COVERAGE = os.path.join(REPO, "COVERAGE.md")
QUERIES = os.path.join(REPO, "src/main/scala/graft/Queries.scala")
TESTS = os.path.join(REPO, "src/test/scala/graft")
OUT = os.path.join(REPO, "tools/coverage_index.json")


def parse_querydefs():
    """QueryDef name -> has_oracle, from the Scala catalog (regex on the literal
    QueryDef("name" heads; oracle presence = a Some(...) before the next QueryDef)."""
    src = open(QUERIES, encoding="utf-8").read()
    heads = [(m.group(1), m.start()) for m in re.finditer(r'QueryDef\("([a-z0-9_]+)"', src)]
    out = {}
    for i, (name, start) in enumerate(heads):
        end = heads[i + 1][1] if i + 1 < len(heads) else len(src)
        body = src[start:end]
        out[name] = {"oracle": ("Some(" in body) or ("Some {" in body)}
    return out


def spec_names():
    return {f[:-len(".scala")] for f in os.listdir(TESTS) if f.endswith("Spec.scala")}


def parse_coverage(query_names, specs):
    rows, section = [], None
    header_skip = re.compile(r"^\|\s*(reference|operator|---|:?-+)")
    for line in open(COVERAGE, encoding="utf-8"):
        line = line.rstrip("\n")
        if line.startswith("#"):
            section = line.lstrip("#").strip()
            continue
        if not line.startswith("|") or header_skip.match(line):
            continue
        cells = [c.strip() for c in line.strip("|").split("|")]
        if len(cells) < 3:
            continue
        ref, impl, verified = cells[0], cells[1], " | ".join(cells[2:])
        # Only REAL QueryDef names count — a permissive snake_case match would list
        # column names like doc_id as "queries" and inflate rows_with_query.
        cited_q = sorted({q for q in re.findall(r"`([a-z0-9_]+)`", verified)
                          if q in query_names})
        cited_specs = sorted(set(re.findall(r"\b([A-Z][A-Za-z0-9]*Spec)\b", verified)))
        rows.append({
            "section": section,
            "reference": ref,
            "impl": impl,
            "verified_by": verified,
            "queries": cited_q,
            "specs": cited_specs,
        })
    return rows


TABLE_SUFFIXES = ("_documents", "_events", "_orders", "_lineitem", "_customer",
                  "_embeddings", "_nation", "_region", "_part", "_supplier",
                  "_synthetic", "_props")


def main():
    qdefs = parse_querydefs()
    specs = spec_names()
    rows = parse_coverage(set(qdefs), specs)
    # Citations are counted across the WHOLE file (tables + prose paragraphs);
    # per-row query lists stay table-scoped.
    full = open(COVERAGE, encoding="utf-8").read()
    all_cited = set(re.findall(r"`([a-z0-9_]+)`", full))
    cited_queries = all_cited & set(qdefs)
    # Doc rot = a cited name that LOOKS like a query (engine naming convention:
    # <operator>_<table-suffix>) but has no QueryDef. Plain snake_case tokens
    # (DuckDB/Spark function names in prose) don't qualify.
    rotted = sorted(t for t in all_cited - set(qdefs) if t.endswith(TABLE_SUFFIXES))
    cited_specs = {s for r in rows for s in r["specs"]}
    index = {
        "rows": rows,
        "queries": {name: meta for name, meta in sorted(qdefs.items())},
        "stats": {
            "coverage_rows": len(rows),
            "rows_with_query": sum(1 for r in rows if r["queries"]),
            "rows_with_spec": sum(1 for r in rows if r["specs"]),
            "n_queries": len(qdefs),
            "n_oracled": sum(1 for m in qdefs.values() if m["oracle"]),
            "n_specs": len(specs),
        },
        "unknown_queries": rotted,
        "unreferenced_queries": sorted(set(qdefs) - cited_queries),
        "unknown_specs": sorted(cited_specs - specs),
    }
    rendered = json.dumps(index, indent=1, sort_keys=False) + "\n"
    if "--check" in sys.argv:
        current = open(OUT, encoding="utf-8").read() if os.path.exists(OUT) else ""
        if current != rendered:
            print("coverage_index.json is STALE — rerun tools/coverage_index.py")
            sys.exit(1)
        print("coverage_index.json is current")
        return
    with open(OUT, "w", encoding="utf-8") as f:
        f.write(rendered)
    s = index["stats"]
    print(f"wrote {OUT}")
    print(f"  {s['coverage_rows']} coverage rows ({s['rows_with_query']} query-backed, "
          f"{s['rows_with_spec']} spec-backed)")
    print(f"  {s['n_queries']} QueryDefs ({s['n_oracled']} oracled), {s['n_specs']} spec suites")
    if index["unknown_queries"]:
        print(f"  DOC ROT — cited but no QueryDef: {index['unknown_queries']}")
    if index["unreferenced_queries"]:
        print(f"  undocumented queries: {len(index['unreferenced_queries'])}")
    if index["unknown_specs"]:
        print(f"  cited but missing spec files: {index['unknown_specs']}")


if __name__ == "__main__":
    main()
