"""Differential SQL fuzzer: generated ANSI-core queries, Spark vs
DuckDB.

The declared-query registry pins ~330 hand-written queries; this tool
covers the space BETWEEN them — thousands of machine-generated
projections/filters/aggregations over the fixture tables, executed on
both engines and value-compared with the same canonicalization as the
oracle harness. A dialect divergence, cast bug, or optimizer
miscompile anywhere in the shared ANSI core shows up as a mismatch on
some random query long before a user hits it.

Generator discipline (kept deliberately inside the two engines'
common semantics):
- integer/decimal arithmetic only (double SUMs are rounded);
- no NULLs in sort keys (fixture columns are non-null);
- deterministic seed → the same query set every run (failures are
  reproducible by seed + index).

Usage:
    python tools/sql_fuzz.py [N] [SEED]    # default 200 queries
"""

from __future__ import annotations

import random
import sys

# (name, type) columns of the orders/customer fixture slices we fuzz
ORDERS_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_totalprice", "num"),
    ("o_orderpriority", "str"),
    ("o_orderstatus", "str"),
]
CUSTOMER_COLS = [
    ("c_custkey", "int"),
    ("c_nationkey", "int"),
    ("c_acctbal", "num"),
    ("c_mktsegment", "str"),
]
LINEITEM_COLS = [
    ("l_orderkey", "int"),
    ("l_partkey", "int"),
    ("l_suppkey", "int"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "date"),
]
TABLES = {
    "orders": ORDERS_COLS,
    "customer": CUSTOMER_COLS,
    "lineitem": LINEITEM_COLS,
}
STR_LITS = {
    "o_orderpriority": ["'1-URGENT'", "'2-HIGH'", "'3-MEDIUM'"],
    "o_orderstatus": ["'O'", "'F'", "'P'"],
    "c_mktsegment": ["'BUILDING'", "'AUTOMOBILE'", "'MACHINERY'"],
    "l_returnflag": ["'A'", "'N'", "'R'"],
    "l_linestatus": ["'F'", "'O'"],
}


def _pred(rng: random.Random, cols) -> str:
    name, typ = rng.choice(cols)
    if typ == "date":
        y, m = rng.randint(1993, 1997), rng.randint(1, 12)
        d = f"DATE '{y}-{m:02d}-15'"
        return rng.choice(
            [
                f"{name} < {d}",
                f"{name} >= {d}",
                f"{name} BETWEEN {d} AND {d} + INTERVAL 90 DAY",
            ]
        )
    if typ == "str":
        lits = STR_LITS[name]
        if rng.random() < 0.5:
            return f"{name} = {rng.choice(lits)}"
        return f"{name} IN ({', '.join(rng.sample(lits, 2))})"
    if typ == "num":
        v = rng.randint(1000, 400000)
        return rng.choice(
            [
                f"{name} < {v}",
                f"{name} >= {v}",
                f"{name} BETWEEN {v} AND {v + 50000}",
            ]
        )
    v = rng.randint(0, 5000)
    return rng.choice(
        [
            f"{name} % {rng.randint(2, 13)} = {rng.randint(0, 1)}",
            f"{name} < {v}",
            f"{name} >= {v}",
        ]
    )


def _gen_lineitem_join(rng: random.Random) -> str:
    """lineitem ⋈ orders fact-side join: decimal-exact revenue math
    and date predicates on the fact, grouped by dims from either
    side."""
    group_cols = [
        c
        for c in ["l_returnflag", "l_linestatus", "o_orderpriority"]
        if rng.random() < 0.5
    ][:2] or ["l_returnflag"]
    aggs = [
        "CAST(COUNT(*) AS BIGINT) AS n",
        "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) "
        "AS s_price",
    ]
    if rng.random() < 0.5:
        aggs.append(
            "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) "
            "AS s_qty"
        )
    preds = [_pred(rng, LINEITEM_COLS)]
    if rng.random() < 0.5:
        preds.append(_pred(rng, ORDERS_COLS))
    return (
        f"SELECT {', '.join(group_cols + aggs)} "
        f"FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        f"WHERE {' AND '.join(preds)} "
        f"GROUP BY {', '.join(group_cols)} "
        f"ORDER BY {', '.join(group_cols)}"
    )


def gen_join_query(rng: random.Random) -> str:
    """orders ⋈ customer or lineitem ⋈ orders on the FK, filters on
    both sides, grouped aggregates drawn from both tables — the join
    member of the fuzzed shape space."""
    if rng.random() < 0.4:
        return _gen_lineitem_join(rng)
    all_cols = ORDERS_COLS + CUSTOMER_COLS
    group_cols = [
        n
        for n, t in all_cols
        if t == "str" and rng.random() < 0.5
    ][:2]
    aggs = ["CAST(COUNT(*) AS BIGINT) AS n"]
    for n, t in all_cols:
        if n in group_cols:
            continue
        if t == "num" and rng.random() < 0.5:
            aggs.append(
                f"CAST(SUM(CAST({n} AS DECIMAL(18,2))) AS DOUBLE) "
                f"AS s_{n}"
            )
        elif t == "int" and rng.random() < 0.3:
            aggs.append(f"CAST(MAX({n}) AS BIGINT) AS mx_{n}")
    preds = []
    if rng.random() < 0.7:
        preds.append(_pred(rng, ORDERS_COLS))
    if rng.random() < 0.7:
        preds.append(_pred(rng, CUSTOMER_COLS))
    where = f" WHERE {' AND '.join(preds)}" if preds else ""
    join = (
        "orders JOIN customer ON o_custkey = c_custkey"
        if rng.random() < 0.7
        else "orders LEFT JOIN customer ON o_custkey = c_custkey"
    )
    if group_cols:
        sel = ", ".join(group_cols + aggs)
        tail = (
            f" GROUP BY {', '.join(group_cols)}"
            f" ORDER BY {', '.join(group_cols)}"
        )
    else:
        sel = ", ".join(aggs)
        tail = ""
    return f"SELECT {sel} FROM {join}{where}{tail}"


def gen_window_query(rng: random.Random) -> str:
    """Window-function member: rank/row_number/running aggregates
    over deterministic (unique-key tie-broken) orders, wrapped in an
    outer filter so frame edges are exercised.

    Restricted to the tables whose first column IS a unique key —
    lineitem's l_orderkey repeats per line, which would make every
    ROW_NUMBER tie-break nondeterministic."""
    table = rng.choice(["orders", "customer"])
    cols = TABLES[table]
    key = cols[0][0]  # unique key: o_orderkey / c_custkey
    part, _ = rng.choice([c for c in cols if c[1] == "str"])
    num = rng.choice([n for n, t in cols if t == "num"])
    fn = rng.choice(
        [
            f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {key})",
            f"RANK() OVER (PARTITION BY {part} "
            f"ORDER BY {num} DESC, {key})",
            f"CAST(SUM(CAST({num} AS DECIMAL(18,2))) OVER ("
            f"PARTITION BY {part} ORDER BY {key} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            f"AS DOUBLE)",
            f"CAST(LAG({key}) OVER (PARTITION BY {part} "
            f"ORDER BY {key}) AS BIGINT)",
            f"CAST(MIN({key}) OVER (PARTITION BY {part} "
            f"ORDER BY {key} ROWS BETWEEN 3 PRECEDING AND "
            f"1 PRECEDING) AS BIGINT)",
        ]
    )
    limit_v = rng.randint(3, 12)
    return (
        f"SELECT * FROM ("
        f"SELECT {key}, {part}, {fn} AS wv FROM {table}"
        f") t WHERE {key} % {rng.randint(7, 31)} = 0"
        f" ORDER BY {key} LIMIT {limit_v * 10}"
    )


def gen_setop_query(rng: random.Random) -> str:
    """Set-operation member: two filtered projections of the same
    table combined with UNION/INTERSECT/EXCEPT (ALL and DISTINCT),
    wrapped in a counting aggregate so results stay canonical."""
    table = rng.choice(list(TABLES))
    cols = TABLES[table]
    key = cols[0][0]
    p1, p2 = _pred(rng, cols), _pred(rng, cols)
    op = rng.choice(
        ["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]
    )
    case_col = rng.choice([n for n, t in cols if t == "num"])
    sel = (
        f"{key}, CASE WHEN {case_col} < 100000 THEN 'lo' "
        f"WHEN {case_col} < 250000 THEN 'mid' ELSE 'hi' END AS band"
    )
    return (
        f"SELECT band, CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(SUM({key}) AS BIGINT) AS key_sum FROM ("
        f"SELECT {sel} FROM {table} WHERE {p1} "
        f"{op} "
        f"SELECT {sel} FROM {table} WHERE {p2}"
        f") t GROUP BY band ORDER BY band"
    )


def gen_scalar_query(rng: random.Random) -> str:
    """Scalar-expression member: string/date/arithmetic functions in
    the shared dialect core, grouped and aggregated so outputs stay
    small and canonical."""
    exprs = [
        ("upper(substr(o_orderpriority, 1, 3))", "orders"),
        ("CAST(length(o_orderpriority) AS BIGINT)", "orders"),
        ("CAST(extract(month FROM o_orderdate) AS BIGINT)", "orders"),
        ("CAST(extract(year FROM o_orderdate) AS BIGINT)", "orders"),
        ("concat(o_orderstatus, '-', substr(o_orderpriority, 1, 1))",
         "orders"),
        ("CAST(o_orderkey % 7 AS BIGINT)", "orders"),
        ("CAST(abs(o_custkey - 500) AS BIGINT)", "orders"),
        ("upper(substr(c_mktsegment, 2, 4))", "customer"),
        ("CAST(round(c_acctbal) AS BIGINT)", "customer"),
        ("CAST(floor(c_acctbal / 500) AS BIGINT)", "customer"),
    ]
    e1, t1 = rng.choice(exprs)
    pool = [e for e, t in exprs if t == t1 and e != e1]
    e2 = rng.choice(pool) if pool else e1
    pred = _pred(rng, TABLES[t1])
    return (
        f"SELECT {e1} AS k1, {e2} AS k2, "
        f"CAST(COUNT(*) AS BIGINT) AS n FROM {t1} "
        f"WHERE {pred} GROUP BY k1, k2 ORDER BY k1, k2"
    )


def gen_subquery_query(rng: random.Random) -> str:
    """Subquery member: EXISTS / NOT EXISTS correlated on the FK, or
    an uncorrelated scalar-aggregate comparison — the decorrelation
    paths both optimizers rewrite to joins."""
    p_c = _pred(rng, CUSTOMER_COLS)
    p_o = _pred(rng, ORDERS_COLS)
    if rng.random() < 0.5:
        ex = rng.choice(["EXISTS", "NOT EXISTS"])
        return (
            f"SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM(o_orderkey) AS BIGINT) AS key_sum "
            f"FROM orders o WHERE {p_o} AND {ex} ("
            f"SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey "
            f"AND {p_c}) "
            f"GROUP BY o_orderpriority ORDER BY o_orderpriority"
        )
    cmp_op = rng.choice(["<", ">="])
    return (
        f"SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM orders WHERE {p_o} AND CAST(o_totalprice AS DECIMAL(18,2)) "
        f"{cmp_op} (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2))) "
        f"AS DECIMAL(18,6)) FROM orders) "
        f"GROUP BY o_orderstatus ORDER BY o_orderstatus"
    )


def gen_groupingsets_query(rng: random.Random) -> str:
    """Multi-level aggregation member: GROUPING SETS / ROLLUP / CUBE
    with GROUPING() disambiguation of the NULL grouping placeholders
    (the dialect corner where engines differ most in surprising
    ways).

    Found-and-excluded divergence (first run of this shape, seed 777
    #27): over an EMPTY input relation the () grouping set is a
    global aggregate, so the standard (and DuckDB) emit one
    grand-total row with n=0 — Spark emits zero rows. The predicate
    here is a key-mod filter that can't empty the fixture, keeping
    the shape inside the engines' common semantics; the divergence
    itself is pinned in tests/test_sql_fuzz.py so a future Spark fix
    is noticed."""
    table = rng.choice(list(TABLES))
    cols = TABLES[table]
    strs = [n for n, t in cols if t == "str"]
    ints = [n for n, t in cols if t == "int"]
    key = cols[0][0]
    a = rng.choice(strs)
    b = rng.choice(ints[1:] or ints)
    spec = rng.choice(
        [
            f"GROUPING SETS (({a}), ({a}, {b} % 5), ())",
            f"ROLLUP ({a}, {b} % 5)",
            f"CUBE ({a}, {b} % 5)",
        ]
    )
    # non-empty by construction: key is dense 1..N with N >= 150
    pred = f"{key} % {rng.randint(2, 7)} = {rng.randint(0, 1)}"
    return (
        f"SELECT COALESCE({a}, '(all)') AS ga, "
        f"COALESCE(CAST({b} % 5 AS BIGINT), -1) AS gb, "
        f"CAST(GROUPING({a}) AS BIGINT) AS ia, "
        f"CAST(GROUPING({b} % 5) AS BIGINT) AS ib, "
        f"CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM {table} WHERE {pred} "
        f"GROUP BY {spec} ORDER BY ia, ib, ga, gb"
    )


def gen_query(rng: random.Random) -> str:
    u = rng.random()
    if u < 0.17:
        return gen_scalar_query(rng)
    if u < 0.34:
        return gen_join_query(rng)
    if u < 0.47:
        return gen_window_query(rng)
    if u < 0.58:
        return gen_setop_query(rng)
    if u < 0.68:
        return rng.choice([gen_subquery_query, gen_groupingsets_query])(rng)
    table = rng.choice(list(TABLES))
    cols = TABLES[table]
    group_cols = [
        n for n, t in cols if t in ("str", "int") and rng.random() < 0.4
    ][:2]
    aggs = []
    for n, t in cols:
        if n in group_cols:
            continue
        if t == "num" and rng.random() < 0.6:
            aggs.append(
                f"CAST(SUM(CAST({n} AS DECIMAL(18,2))) AS DOUBLE) "
                f"AS s_{n}"
            )
        elif t == "int" and rng.random() < 0.4:
            aggs.append(
                rng.choice(
                    [
                        f"CAST(MIN({n}) AS BIGINT) AS mn_{n}",
                        f"CAST(MAX({n}) AS BIGINT) AS mx_{n}",
                        f"CAST(SUM({n}) AS BIGINT) AS s_{n}",
                    ]
                )
            )
    aggs.append("CAST(COUNT(*) AS BIGINT) AS n")
    preds = [_pred(rng, cols) for _ in range(rng.randint(0, 2))]
    where = f" WHERE {' AND '.join(preds)}" if preds else ""
    if group_cols:
        sel = ", ".join(group_cols + aggs)
        tail = (
            f" GROUP BY {', '.join(group_cols)}"
            f" ORDER BY {', '.join(group_cols)}"
        )
        if rng.random() < 0.3:
            tail = (
                f" GROUP BY {', '.join(group_cols)}"
                f" HAVING COUNT(*) > {rng.randint(1, 5)}"
                f" ORDER BY {', '.join(group_cols)}"
            )
    else:
        sel = ", ".join(aggs)
        tail = ""
    return f"SELECT {sel} FROM {table}{where}{tail}"


def run_fuzz(n: int = 200, seed: int = 20240814, sf_dir: str | None = None):
    import duckdb

    sys.path.insert(0, "/root/repo")
    from etl_lens_spark.session import get_spark
    from etl_lens_spark.sources.tables import load_table
    from tools.oracle_check import canon_rows

    sf_dir = sf_dir or "/root/testdata/sf0.001"
    spark = get_spark(app_name="sql-fuzz", shuffle_partitions=4)
    con = duckdb.connect()
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    rng = random.Random(seed)
    failures = []
    for i in range(n):
        q = gen_query(rng)
        sdf = spark.sql(q)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        drel = con.sql(q)
        drows = drel.fetchall()
        dcols = [d[0] for d in drel.description]
        sh = canon_rows(scols, srows)
        dh = canon_rows(dcols, drows)
        if sh != dh or len(srows) != len(drows):
            failures.append((i, q, len(srows), len(drows)))
    return n, failures


def main(argv):
    n = int(argv[0]) if argv else 200
    seed = int(argv[1]) if len(argv) > 1 else 20240814
    total, failures = run_fuzz(n, seed)
    for i, q, sn, dn in failures:
        print(f"MISMATCH #{i} (spark {sn} rows, duck {dn} rows): {q}")
    print(f"{total - len(failures)}/{total} agree (seed {seed})")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
