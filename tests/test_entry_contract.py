"""Driver-contract invariants for __spark_entry__."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_queries_and_oracles_align():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o).issubset(set(q)), "every oracle must have a query"
    assert len(q) >= 30


def test_entry_runs_and_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"l_returnflag", "l_linestatus", "count_order"} <= set(df.columns)


def test_queries_run_at_smallest_sf(spark):
    """Every queries() entry must at least build a plan and execute at
    sf0.001 (smoke; value correctness is the oracle gate)."""
    sf = "/root/testdata/sf0.001"
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf)
        df.limit(5).collect()  # force execution of the plan


def test_every_oracle_parses_in_duckdb():
    """EXPLAIN every oracle against empty views — catches SQL syntax/binder
    errors in seconds without running the full value gate."""
    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.sql("CREATE TABLE region (r_regionkey INT, r_name VARCHAR)")
    con.sql("CREATE TABLE nation (n_nationkey INT, n_name VARCHAR, n_regionkey INT)")
    con.sql(
        "CREATE TABLE customer (c_custkey BIGINT, c_name VARCHAR, c_nationkey INT,"
        " c_acctbal DOUBLE, c_mktsegment VARCHAR)"
    )
    con.sql(
        "CREATE TABLE supplier (s_suppkey BIGINT, s_name VARCHAR, s_nationkey INT,"
        " s_acctbal DOUBLE)"
    )
    con.sql(
        "CREATE TABLE part (p_partkey BIGINT, p_name VARCHAR, p_brand VARCHAR,"
        " p_type VARCHAR, p_size INT, p_retailprice DOUBLE)"
    )
    con.sql(
        "CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT,"
        " o_orderstatus VARCHAR, o_totalprice DOUBLE, o_orderdate TIMESTAMP,"
        " o_orderpriority VARCHAR)"
    )
    con.sql(
        "CREATE TABLE lineitem (l_orderkey BIGINT, l_partkey BIGINT,"
        " l_suppkey BIGINT, l_linenumber INT, l_quantity DOUBLE,"
        " l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE,"
        " l_returnflag VARCHAR, l_linestatus VARCHAR, l_shipdate TIMESTAMP)"
    )
    con.sql(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.sql(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.sql("CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[], label INT)")
    bad = {}
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad[name] = str(e).splitlines()[0]
    assert not bad, bad


def test_no_two_oracles_share_the_same_sql():
    """A module-level SQL variable shadowed by a later definition silently
    rebinds BOTH queries to one oracle (the r3 _QUALITY_SQL collision);
    identical oracle strings for different queries are that bug's
    signature, never legitimate (column names must differ)."""
    # Two Spark implementations of the SAME semantics legitimately share an
    # oracle — those pairs are declared here; anything else is the bug.
    EQUIVALENT = {
        ("mktsegment_revenue", "mktsegment_revenue_salted"),   # salting is plan-only
        ("events_compact_latest", "events_changelog_apply"),   # apply ≡ compaction
        # PPJoin's exactness CLAIM is that prefix filtering returns the
        # exhaustive join's result — sharing that oracle IS the gate
        ("dedup_ngram_jaccard", "dedup_ppjoin_pairs"),
    }
    o = entrymod.oracle_sql()
    by_sql = {}
    for name, sql in o.items():
        by_sql.setdefault(sql, []).append(name)
    dupes = {tuple(sorted(v)) for v in by_sql.values() if len(v) > 1}
    dupes -= {tuple(sorted(p)) for p in EQUIVALENT}
    assert not dupes, f"queries sharing one oracle string: {dupes}"


def test_registry_modules_do_not_cross_shadow():
    """r6 split guard: the registry is now per-family modules referenced by
    QUALIFIED name from __spark_entry__, so a same-named helper in two
    modules can't clobber anything — but only as long as the contract file
    never does a star-import or bare-name rebind. Enforce both halves:

    1. __spark_entry__ contains no `from affinity_spark.registry.X import`
       (bare names would resurrect the r3 _QUALITY_SQL collision class);
    2. every value in queries()/oracle_sql() resolves to an attribute of
       exactly the module that DEFINES it (no accidental re-export served
       from the wrong module).
    """
    import ast
    import inspect

    src = inspect.getsource(entrymod)
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and (
            node.module.startswith("affinity_spark.registry.")
        ):
            raise AssertionError(
                f"bare-name import from {node.module} in __spark_entry__ — "
                "use qualified module references only"
            )

    from affinity_spark import registry

    fams = ["tpch", "events", "docs", "dedup", "embeddings", "media",
            "pipelines", "quality", "series"]
    mods = {f: getattr(registry, f) for f in fams}
    for name, fn in entrymod.queries().items():
        owner = fn.__module__
        assert owner.startswith("affinity_spark.registry."), (name, owner)
        fam = owner.rsplit(".", 1)[1]
        assert getattr(mods[fam], fn.__name__) is fn, (
            f"{name}: {fn.__name__} served from a module that does not "
            f"define it ({owner})"
        )


def test_registry_modules_stay_under_size_budget():
    """The split exists to keep each family reviewable and the collision
    surface per-module; a module creeping back past ~2.5k lines means the
    next family split is due."""
    import os

    import affinity_spark.registry as reg

    root = os.path.dirname(reg.__file__)
    for fname in os.listdir(root):
        if not fname.endswith(".py"):
            continue
        with open(os.path.join(root, fname), encoding="utf-8") as f:
            n = sum(1 for _ in f)
        assert n <= 2500, f"registry/{fname} is {n} lines — split it"


def test_external_consumers_resolve_against_entry_surface():
    """r6 fallout guard: bench.py and several test files reference the entry
    module by attribute. Import bench.py under test and resolve every
    `__spark_entry__.<name>` / `e.<name>` attribute any repo consumer uses,
    so an orphaned reference fails HERE, not as 26 scattered AttributeErrors
    (r6 verdict finding #2)."""
    import ast
    import importlib
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # bench.py must import cleanly (it crashed r6's BENCH gate).
    importlib.import_module("bench")

    # Collect every attribute accessed on an alias of __spark_entry__ in
    # bench.py and tests/, then resolve each against the module.
    consumers = [os.path.join(repo, "bench.py")] + [
        os.path.join(repo, "tests", f)
        for f in os.listdir(os.path.join(repo, "tests"))
        if f.endswith(".py")
    ]
    used: set[str] = set()
    for path in consumers:
        with open(path, encoding="utf-8") as f:
            tree = ast.parse(f.read())
        aliases = set()
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for a in node.names:
                    if a.name == "__spark_entry__":
                        aliases.add(a.asname or a.name)
        if not aliases:
            continue
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Attribute)
                and isinstance(node.value, ast.Name)
                and node.value.id in aliases
            ):
                used.add(node.attr)
    missing = sorted(
        name for name in used if not hasattr(entrymod, name)
    )
    assert not missing, f"entry-surface attributes consumers use but missing: {missing}"


def test_staleness_rotation():
    """The driver checks ~50 queries per round, so the queries() dict order
    IS the evidence-rotation policy. Two invariants keep the stale backlog
    from silently regrowing (r8 verdict: 23 queries sat unchecked since r4):
    (1) after the flagship, order is ascending in each query's most recent
    driver-check round (never-checked first); (2) any query >=3 rounds
    stale must sit inside the driver's next-pass window (first 50), i.e.
    it WILL be re-checked in the imminent run — UNLESS the stale backlog
    itself exceeds the window (new queries land at the front by rule (1),
    and >50 stale queries cannot all fit 50 slots): then the weaker but
    always-satisfiable optimality invariant applies — no query outside
    the window may be staler than any inside it, so the overflow is
    exactly the least-stale tail and clears in the following round.
    Regenerate the ordering with tools/staleness_order.py after adding
    queries or landing a new CORRECTNESS artifact.

    The ordering is validated against the ledger AS OF the snapshot it was
    generated from (the ``ledger-snapshot: rN`` marker the generator stamps
    into queries()): the driver writes CORRECTNESS_rN.json AFTER the round's
    final commit, so without the snapshot this test was structurally red at
    every judge run (r9+r10 verdicts). A round-START regeneration still
    refreshes the ordering to the newest artifact."""
    import inspect
    import sys

    sys.path.insert(0, "tools")
    from staleness_order import FLAGSHIP, committed_snapshot, ledger

    import __spark_entry__ as e

    snapshot = committed_snapshot(inspect.getsource(e))
    last = ledger(max_round=snapshot)
    qs = list(e.queries())
    assert qs[0] == FLAGSHIP
    rounds = [last.get(q, 0) for q in qs[1:]]
    assert rounds == sorted(rounds), (
        "queries() is not in ascending driver-staleness order; "
        "run tools/staleness_order.py"
    )
    latest = max(last.values(), default=0)
    ages = {q: latest - last.get(q, 0) for q in qs}
    n_stale = sum(1 for q in qs if ages[q] >= 3)
    if n_stale < 50:
        for i, q in enumerate(qs):
            if ages[q] >= 3:
                assert i < 50, (
                    f"{q} is {ages[q]} rounds stale at position {i} — outside "
                    "the driver's next CORRECTNESS window; run "
                    "tools/staleness_order.py"
                )
    else:
        # backlog exceeds the window: demand optimality — the window must
        # hold a maximally-stale prefix (ascending last-checked round
        # already asserted above guarantees it; pin it explicitly)
        # the flagship is pinned to slot 0 by policy (age 0 every round)
        worst_inside = min(ages[q] for q in qs[1:50])
        best_outside = max(ages[q] for q in qs[50:])
        assert best_outside <= worst_inside, (
            f"a query outside the 50-slot window (age {best_outside}) is "
            f"staler than one inside (age {worst_inside}); run "
            "tools/staleness_order.py"
        )
