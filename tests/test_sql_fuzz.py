"""Differential SQL fuzz in CI: a deterministic batch of generated
ANSI-core queries must agree between Spark and DuckDB (same
canonicalization as the oracle harness). Reproduce any failure with
`python tools/sql_fuzz.py N SEED` and the reported index."""

from __future__ import annotations

import random

from tools.sql_fuzz import STR_LITS, TABLES, gen_query, run_fuzz


def test_generator_emits_valid_shapes():
    rng = random.Random(1)
    for _ in range(50):
        q = gen_query(rng)
        assert q.startswith("SELECT ") and " FROM " in q
        # the source table appears somewhere in the FROM clause
        # (window shapes wrap it in a derived table)
        assert any(t in q for t in TABLES)
    # every string column used in predicates has literals defined
    for name, typ in [c for cols in TABLES.values() for c in cols]:
        if typ == "str":
            assert name in STR_LITS


def test_sixty_generated_queries_agree(spark):
    total, failures = run_fuzz(n=60, seed=77)
    assert total == 60
    assert not failures, failures
