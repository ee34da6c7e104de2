#!/usr/bin/env python3
"""Build an ADVERSARIAL copy of a scale-factor dir for the oracle gate.

The driver's fixtures are clean: no nulls in key columns, no NaN/Inf, no
pathological strings. Spark and DuckDB disagree on plenty of legal inputs the
fixtures never exercise (ANSI division-by-zero, countDistinct vs tuple-DISTINCT
null handling, nulls-first vs nulls-last ordering under LIMIT, Java-vs-RE2
regex dialect, timestamp-less rows in daily series). This script appends rows
that exercise exactly those corners to every table, preserving each table's
parquet schema bit-for-bit (pyarrow, not a rewrite through another engine), so

    python3 tools/make_adversarial.py /root/testdata/sf0.001 /tmp/sf_adv
    python3 tools/check_oracle.py /tmp/sf_adv /tmp/verify_adv

runs the ENTIRE engine-vs-DuckDB gate over the hostile variant. Every query
that passes here is robust to the whole injected class, not just the happy
path. Row identities (e.g. embeddings vec_id=0, used as the ANN probe seed)
are left untouched; appended ids live far above the fixture id range.
"""
import sys
import os
import pyarrow as pa
import pyarrow.parquet as pq


def append_rows(src_path, dst_path, rows):
    t = pq.read_table(src_path)
    if rows:
        cols = {name: [r.get(name) for r in rows] for name in t.schema.names}
        extra = pa.table(
            {n: pa.array(cols[n], type=t.schema.field(n).type) for n in t.schema.names},
            schema=t.schema)
        t = pa.concat_tables([t, extra])
    pq.write_table(t, dst_path)
    return len(rows)


def main():
    # Flags may appear in any position; positionals are src then dst.
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    src, dst = pos[0], pos[1]
    os.makedirs(dst, exist_ok=True)
    if "--empty" in flags:
        # Zero-row variant of every table (schema preserved): the empty-input class —
        # DuckDB aggregates yield a NULL row where unguarded engine code .get-crashes.
        for f in sorted(os.listdir(src)):
            t = pq.read_table(os.path.join(src, f))
            pq.write_table(t.slice(0, 0), os.path.join(dst, f))
            print(f"{f.removesuffix('.parquet')}: 0 rows")
        return
    NAN, INF = float("nan"), float("inf")

    adv = {
        # Partial-null composite keys (countDistinct vs tuple-DISTINCT), all-null row,
        # NaN/Inf prices (numeric-histogram finite filter), null flags, a returnflag
        # outside the domain, null shipdate (yearly cross-table-sum null group).
        "lineitem": [
            {"l_orderkey": 9_000_001, "l_linenumber": None, "l_quantity": 1.0,
             "l_extendedprice": 10.0, "l_discount": 0.0, "l_tax": 0.0,
             "l_returnflag": "A", "l_linestatus": "O"},
            {"l_orderkey": None, "l_linenumber": 1, "l_quantity": None,
             "l_extendedprice": NAN, "l_returnflag": None, "l_linestatus": None},
            {"l_orderkey": None, "l_linenumber": None},
            {"l_orderkey": 9_000_002, "l_linenumber": 1, "l_quantity": 2.0,
             "l_extendedprice": INF, "l_discount": None, "l_tax": None,
             "l_returnflag": "X\n", "l_linestatus": "F"},
            {"l_orderkey": 9_000_002, "l_linenumber": 2, "l_quantity": -5.0,
             "l_extendedprice": -INF, "l_discount": 0.05, "l_tax": 0.01,
             "l_returnflag": "R", "l_linestatus": "F",
             "l_shipdate": None},
        ],
        # Null order date (incremental null partition + yearly null group), null
        # custkey (FK ignore-nulls), trailing-newline priority (Java $ vs RE2 $),
        # null priority (top-k null group), orphan custkey.
        "orders": [
            {"o_orderkey": 9_100_001, "o_custkey": None, "o_orderstatus": None,
             "o_totalprice": None, "o_orderdate": None, "o_orderpriority": "1-URGENT\n"},
            {"o_orderkey": 9_100_002, "o_custkey": 99_999_999, "o_orderstatus": "O",
             "o_totalprice": NAN, "o_orderdate": None, "o_orderpriority": None},
            {"o_orderkey": None, "o_custkey": 1, "o_orderstatus": "Z",
             "o_totalprice": 0.0, "o_orderpriority": None},
        ],
        "customer": [
            {"c_custkey": 9_200_001, "c_name": None, "c_nationkey": None,
             "c_acctbal": None, "c_mktsegment": None},
            {"c_custkey": None, "c_name": "", "c_acctbal": NAN, "c_mktsegment": "X"},
        ],
        # Null ts (daily series / window adjacency), null event_id (uniqueness null
        # modes), null event_type (grouped-completeness null group), invalid and null
        # JSON props, null user_id window partition.
        "events": [
            {"event_id": None, "ts": None, "user_id": None, "event_type": None,
             "value": None, "props": None},
            {"event_id": 9_300_001, "ts": None, "user_id": 1, "event_type": "click",
             "value": 1.0, "props": "{not json"},
            {"event_id": 9_300_002, "ts": "TS_EPOCH_1700000000", "user_id": None,
             "event_type": None, "value": NAN, "props": "[]"},
        ],
        # Null text / empty text / whitespace-dialect text (VT 0x0B is \s in Java but
        # not RE2), trailing newline, null lang + null doc_id (dedup tiebreak), exact
        # duplicate pair with one null id. Unicode classes target the multilingual
        # LLM-data reality: codepoint-vs-byte length() drift, supplementary-plane
        # (non-BMP) chars through Java regex vs RE2, combining marks, CJK text with no
        # whitespace at all (zero ws-tokens), NBSP (not \s in either dialect but a
        # classic tokenizer trap), a whitespace-only doc, and a pathological single
        # 5k-char token (shingle/minhash kernel stress).
        "documents": [
            {"doc_id": 9_400_001, "text": None, "lang": None, "source": "adv",
             "n_chars": None},
            {"doc_id": 9_400_002, "text": "", "lang": "en", "source": "adv", "n_chars": 0},
            {"doc_id": 9_400_003, "text": "alpha\x0bbeta gamma\n", "lang": "en",
             "source": "adv", "n_chars": 17},
            {"doc_id": None, "text": "duplicate adversarial body text here",
             "lang": "xx", "source": "adv", "n_chars": 36},
            {"doc_id": 9_400_005, "text": "duplicate adversarial body text here",
             "lang": "xx", "source": "adv", "n_chars": 36},
            {"doc_id": 9_400_006, "text": "\U0001F600\U0001F600 emoji \U0001D518\U0001D52B\U0001D526 math-bold test",
             "lang": "en", "source": "adv", "n_chars": 30},
            {"doc_id": 9_400_007, "text": "中文文本没有空格也需要正确处理的情况",
             "lang": "zh", "source": "adv", "n_chars": 18},
            {"doc_id": 9_400_008, "text": "cafe\u0301 combining vs caf\u00e9 precomposed",
             "lang": "fr", "source": "adv", "n_chars": 34},
            {"doc_id": 9_400_009, "text": "nbsp\u00a0separated\u00a0words here",
             "lang": "en", "source": "adv", "n_chars": 25},
            {"doc_id": 9_400_010, "text": "   \t  \n ", "lang": None, "source": "adv",
             "n_chars": 8},
            {"doc_id": 9_400_011, "text": "y" * 5000, "lang": None, "source": "adv",
             "n_chars": 5000},
        ],
        # Null embedding and an all-zero vector (ANN zero-vector exclusion); ids far
        # from the probe seed vec_id=0.
        "embeddings": [
            {"vec_id": 9_500_001, "embedding": None, "label": None},
            {"vec_id": 9_500_002, "embedding": [0.0] * 64, "label": 0},
        ],
        "nation": [
            {"n_nationkey": None, "n_name": "NULLLAND, \"quoted\"\nline", "n_regionkey": None},
        ],
        "region": [
            {"r_regionkey": None, "r_name": None},
        ],
        # Null p_size (datatype inference null class).
        "part": [
            {"p_partkey": 9_600_001, "p_name": None, "p_brand": None, "p_type": None,
             "p_size": None, "p_retailprice": NAN},
        ],
        "supplier": [
            {"s_suppkey": None, "s_name": None, "s_nationkey": None, "s_acctbal": None},
        ],
    }

    # n_chars derives from the text (Python len == codepoints == Spark length()), so
    # an n_chars-vs-length(text) consistency constraint sees these rows as CONSISTENT
    # — the hostile classes here are the texts themselves, not a planted metadata
    # mismatch that would fail such a constraint for an unintended reason.
    for row in adv["documents"]:
        row["n_chars"] = len(row["text"]) if row["text"] is not None else None

    # embeddings list type needs the fixture's element count for the zero vector probe
    emb = pq.read_table(os.path.join(src, "embeddings.parquet"))
    dim = len(emb.column("embedding")[0].as_py())
    adv["embeddings"][1]["embedding"] = [0.0] * dim

    # The injected "valid" ts must honor the fixture's actual timestamp unit — the
    # driver has shipped events.ts as both ns and us across regenerations, and a raw
    # integer literal interpreted in the wrong unit lands the row ~54,000 years out
    # (and overflows Python datetime materialization of the table).
    ts_type = pq.read_schema(os.path.join(src, "events.parquet")).field("ts").type
    unit_mult = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[ts_type.unit]
    for row in adv["events"]:
        if row.get("ts") == "TS_EPOCH_1700000000":
            row["ts"] = 1_700_000_000 * unit_mult

    for f in sorted(os.listdir(src)):
        name = f.removesuffix(".parquet")
        n = append_rows(os.path.join(src, f), os.path.join(dst, f), adv.get(name, []))
        print(f"{name}: +{n} adversarial rows")


if __name__ == "__main__":
    main()
