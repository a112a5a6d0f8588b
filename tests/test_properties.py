"""Property-based tests (hypothesis) — a layer the reference does NOT
have (SURVEY §5: no property/randomized testing anywhere). Each
property checks a distributed operator against a trivial sequential
model on randomized inputs."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from seatunnel_spark.types import ROW_KIND_COL


# -- changelog compaction model ---------------------------------------------

_EVENTS = st.lists(
    st.tuples(
        st.sampled_from(["+I", "-U", "+U", "-D"]),
        st.integers(min_value=0, max_value=5),       # key
        st.integers(min_value=0, max_value=99),      # value
    ),
    min_size=0, max_size=30,
)


def _model_compact(events):
    """Sequential reference model: last event per key wins; -U is
    transient; a trailing -D removes the key."""
    state = {}
    for kind, k, v in events:
        if kind == "-U":
            continue
        state[k] = (kind, v)
    return {k: v for k, (kind, v) in state.items() if kind != "-D"}


@settings(max_examples=15, deadline=None)
@given(_EVENTS)
def test_compact_changelog_matches_sequential_model(spark, events):
    """Event order is an EXPLICIT `__offset` feed position (Kafka
    record offset / binlog pos / FakeSource row index) — never implicit
    DataFrame arrival order, which doesn't survive repartitioning. The
    compacted result must match the sequential model AND be identical
    under any partition layout."""
    from seatunnel_spark.sinks.jdbc import compact_changelog

    if not events:
        return
    df = spark.createDataFrame(
        [(kind, k, v, i) for i, (kind, k, v) in enumerate(events)],
        [ROW_KIND_COL, "k", "v", "__offset"],
    )
    got = {r["k"]: r["v"] for r in compact_changelog(df, ["k"]).collect()}
    assert got == _model_compact(events)
    shuffled = {r["k"]: r["v"] for r in
                compact_changelog(df.repartition(7), ["k"]).collect()}
    assert shuffled == got


# -- salted join == plain join ----------------------------------------------

@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 99)),
             min_size=0, max_size=25),
    st.lists(st.integers(0, 6), min_size=0, max_size=7, unique=True),
)
def test_salted_join_equals_plain(spark, left_rows, right_keys):
    from seatunnel_spark.dataops import salted_join

    if not left_rows or not right_keys:
        return
    left = spark.createDataFrame(left_rows, ["k", "v"])
    right = spark.createDataFrame([(k, f"r{k}") for k in right_keys],
                                  ["k", "name"])
    plain = sorted(map(tuple, left.join(right, "k").collect()))
    salted = sorted(map(tuple, salted_join(left, right, "k", salt=3).collect()))
    assert plain == salted


# -- Zeta datediff sign/unit properties -------------------------------------

_DATES = st.dates(min_value=__import__("datetime").date(1990, 1, 1),
                  max_value=__import__("datetime").date(2030, 12, 28))


@settings(max_examples=15, deadline=None)
@given(_DATES, _DATES)
def test_zeta_datediff_antisymmetric_and_day_exact(spark, d1, d2):
    from seatunnel_spark.transforms import get_transform

    df = spark.createDataFrame([(1,)], ["id"])

    def run(expr):
        out = get_transform(
            "Sql", {"plugin_input": "p_in",
                    "query": f"SELECT {expr} AS v FROM p_in"}
        ).apply(df)
        return out.first()["v"]

    a, b = f"DATE '{d1}'", f"DATE '{d2}'"
    fwd = run(f"DATEDIFF({a}, {b})")
    bwd = run(f"DATEDIFF({b}, {a})")
    assert fwd == -bwd                       # antisymmetry
    assert fwd == (d2 - d1).days             # Zeta: b - a in calendar days


# -- exact dedup: one survivor per key, lowest order wins --------------------

@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                min_size=1, max_size=30))
def test_exact_dedup_keeps_min_order(spark, rows):
    from seatunnel_spark.dataops import exact_dedup

    df = spark.createDataFrame(rows, ["k", "ord"])
    got = {r["k"]: r["ord"] for r in exact_dedup(df, ["k"], "ord").collect()}
    expect = {}
    for k, o in rows:
        expect[k] = min(o, expect.get(k, o))
    assert got == expect
