"""Property-based tests: Spark operators vs pure-Python reference models.

Few examples per property (Spark round-trips are seconds each); the value is
in the adversarial shapes hypothesis finds — empty inputs, duplicate keys,
cycles, unicode — not in volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

ids = st.integers(min_value=0, max_value=9)
names = st.text(alphabet="abcXYZ ", min_size=0, max_size=8)


@SET
@given(
    target=st.lists(st.tuples(ids, names), max_size=8, unique_by=lambda t: t[0]),
    updates=st.lists(st.tuples(ids, names), max_size=8, unique_by=lambda t: t[0]),
)
def test_merge_upsert_model(spark, target, updates):
    from schemamap_spark.sources.merge import merge_upsert

    tdf = spark.createDataFrame(
        [(i, n, 0) for i, n in target], "id long, name string, version long"
    )
    udf = spark.createDataFrame(
        [(i, n, 0) for i, n in updates], "id long, name string, version long"
    )
    got = {
        r.id: (r.name, r.version)
        for r in merge_upsert(tdf, udf, keys=["id"], update_cols=["name"],
                              version_col="version").collect()
    }
    # pure-python model
    want = {i: (n, 0) for i, n in target}
    for i, n in updates:
        want[i] = (n, 1) if i in want else (n, 0)
    assert got == want


@SET
@given(
    edges=st.lists(st.tuples(ids, ids), min_size=0, max_size=15),
)
def test_transitive_closure_model(spark, edges):
    from schemamap_spark.operators.graph import transitive_closure

    if not edges:
        return
    edf = spark.createDataFrame(
        [(str(a), str(b)) for a, b in edges], "member string, roleof string"
    )
    got = {(r.member, r.roleof) for r in transitive_closure(edf).collect()}

    # reflexive-free reachability model (handles cycles)
    adj: dict[str, set[str]] = {}
    for a, b in edges:
        adj.setdefault(str(a), set()).add(str(b))
    want = set()
    for start in adj:
        seen, stack = set(), list(adj.get(start, ()))
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            want.add((start, n))
            stack.extend(adj.get(n, ()))
    assert got == want


@SET
@given(
    texts=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12).map(" ".join),
        min_size=0,
        max_size=8,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
)
def test_jaccard_pairs_model(spark, texts, threshold):
    from schemamap_spark.operators.dedup import jaccard_similar_pairs

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {(r.i, r.j) for r in jaccard_similar_pairs(docs, threshold, k=2).collect()}

    def sh(t):
        toks = t.split(" ")
        return {f"{toks[x]} {toks[x + 1]}" for x in range(len(toks) - 1)} if len(toks) >= 2 else set()

    want = set()
    sets = {i: sh(t) for i, t in enumerate(texts)}
    for i in sets:
        for j in sets:
            if i < j and sets[i] and sets[j]:
                jac = len(sets[i] & sets[j]) / len(sets[i] | sets[j])
                if jac >= threshold:
                    want.add((i, j))
    assert got == want


@SET
@given(
    rows=st.lists(
        st.tuples(ids, st.one_of(st.none(), names)), max_size=10, unique_by=lambda t: t[0]
    ),
)
def test_validation_model(spark, rows):
    from schemamap_spark.imports import ColumnRule, validate

    df = spark.createDataFrame(rows, "id long, name string")
    out = validate(df, [ColumnRule("name", not_null=True, min_length=3)])
    got = {r.id: sorted(r.violations) for r in out.collect()}
    want = {}
    for i, n in rows:
        v = []
        if n is None:
            v.append("name:not_null")
        elif len(n) < 3:
            v.append("name:min_length")
        want[i] = sorted(v)
    assert got == want
