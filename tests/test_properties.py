"""Property-based equivalence tests (hypothesis) for the custom
distributed operators, checked against independent single-node
reference implementations:

- salted_join ≡ plain join (inner and left) on random frames
- asof_join ≡ pandas.merge_asof on random keyed time series
- connected_components ≡ Python union-find on random edge lists

Examples are deliberately few (Spark jobs per example are ~100 ms);
the value is random structure — hot keys, empty sides, ties — not
volume.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from biglake_iceberg_pipeline_spark.operators.graph import (
    connected_components,
)
from biglake_iceberg_pipeline_spark.operators.skew import salted_join
from biglake_iceberg_pipeline_spark.operators.temporal import asof_join

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# keys drawn from a tiny domain => planted collisions and hot keys
_rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 100)), max_size=25
)
_edges = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), max_size=30
)


@given(left=_rows, right=_rows)
@settings(**_SETTINGS)
def test_salted_join_equals_plain_join(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, v) for k, v in left] or [(None, None)], "k int, lv int"
    ).where("k IS NOT NULL")
    rdf = spark.createDataFrame(
        [(k, v) for k, v in right] or [(None, None)], "k int, rv int"
    ).where("k IS NOT NULL")
    for how in ("inner", "left"):
        plain = sorted(
            map(tuple, ldf.join(rdf, "k", how).select("k", "lv", "rv").collect()),
            key=str,
        )
        salted = sorted(
            map(
                tuple,
                salted_join(ldf, rdf, ["k"], n_salts=4, how=how)
                .select("k", "lv", "rv")
                .collect(),
            ),
            key=str,
        )
        assert salted == plain


@given(left=_rows, right=_rows)
@settings(**_SETTINGS)
def test_asof_join_equals_pandas_merge_asof(spark, left, right):
    # (key, t) rows; value = t so the expected match is self-describing
    lpd = pd.DataFrame(
        [(k, pd.Timestamp(2024, 1, 1) + pd.Timedelta(seconds=t)) for k, t in left],
        columns=["k", "ts"],
    ).drop_duplicates()
    rpd = pd.DataFrame(
        [
            (k, pd.Timestamp(2024, 1, 1) + pd.Timedelta(seconds=t), float(t))
            for k, t in right
        ],
        columns=["k", "ts", "v"],
    ).drop_duplicates(subset=["k", "ts"])
    if lpd.empty or rpd.empty:
        return
    expected = pd.merge_asof(
        lpd.sort_values("ts", kind="stable"),
        rpd.sort_values("ts", kind="stable"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    )
    exp = {
        (r.k, r.ts): (None if pd.isna(r.v) else r.v)
        for r in expected.itertuples()
    }
    ldf = spark.createDataFrame(lpd)
    rdf = spark.createDataFrame(rpd)
    got_rows = asof_join(
        ldf, rdf, on=["k"], left_ts="ts", right_ts="ts", right_payload=["v"]
    ).collect()
    got = {(r["k"], pd.Timestamp(r["ts"])): r["v_asof"] for r in got_rows}
    assert got == exp


@given(edges=_edges)
@settings(**_SETTINGS)
def test_connected_components_equals_union_find(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        return
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}
    # union-find roots are not necessarily the min of the component;
    # normalize both sides to min-of-component
    groups: dict[int, list[int]] = {}
    for n, r in expected.items():
        groups.setdefault(r, []).append(n)
    exp_min = {n: min(g) for g in groups.values() for n in g}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(df, "src", "dst").collect()
    }
    assert got == exp_min


_series_rows = st.lists(
    st.tuples(
        st.integers(0, 2),  # key: few keys => per-key series
        st.integers(0, 72),  # hour offset within 3 days
        st.integers(-50, 50),  # value
    ),
    min_size=1,
    max_size=25,
)


@given(rows=_series_rows)
@settings(**_SETTINGS)
def test_gapfill_equals_pandas_reference(spark, rows):
    """hypertable_gapfill ≡ pandas resample('h').sum() + ffill on
    random sparse per-key hourly series (dense spine, LOCF values,
    gap flags)."""
    from datetime import datetime, timedelta

    from biglake_iceberg_pipeline_spark.operators.temporal import (
        hypertable_gapfill,
    )

    base = datetime(2024, 3, 1)
    data = [
        (str(k), base + timedelta(hours=h, minutes=(v % 3) * 7), float(v))
        for k, h, v in rows
    ]
    df = spark.createDataFrame(data, "k string, ts timestamp, value double")
    got = {
        (r.key, r.bucket): (r.value_filled, r.n_events, r.is_gap)
        for r in hypertable_gapfill(df, "ts", "k", "value", "1 hour").collect()
    }

    pdf = pd.DataFrame(data, columns=["k", "ts", "value"])
    expected = {}
    for k, grp in pdf.groupby("k"):
        hourly = (
            grp.set_index("ts")["value"]
            .resample("h")
            .agg(["sum", "count"])
        )
        # pandas resample spans min..max bucket; ffill the sums over
        # empty buckets, which only exist inside that span
        filled = hourly["sum"].where(hourly["count"] > 0).ffill()
        for ts, cnt in hourly["count"].items():
            expected[(k, ts.to_pydatetime())] = (
                round(filled[ts], 2),
                int(cnt),
                cnt == 0,
            )
    assert set(got) == set(expected)
    for key, (v, n, gap) in expected.items():
        gv, gn, ggap = got[key]
        assert (gn, ggap) == (n, gap), key
        assert abs(gv - v) < 1e-9, key


_points = st.lists(st.integers(0, 600), min_size=1, max_size=20)
_intervals = st.lists(
    st.tuples(st.integers(0, 600), st.integers(0, 120)),  # (start, len) sec
    min_size=1,
    max_size=10,
)


@given(points=_points, intervals=_intervals)
@settings(**_SETTINGS)
def test_range_join_equals_brute_force(spark, points, intervals):
    """Bucketized range_join ≡ brute-force containment filter on
    random second-grained points/intervals — exercising intervals that
    span 0..N buckets and points on bucket edges."""
    from datetime import datetime, timedelta

    from biglake_iceberg_pipeline_spark.operators.temporal import range_join

    base = datetime(2024, 3, 1)
    pts = [(i, base + timedelta(seconds=s)) for i, s in enumerate(points)]
    ivs = [
        (j, base + timedelta(seconds=a), base + timedelta(seconds=a + n))
        for j, (a, n) in enumerate(intervals)
    ]
    pdf = spark.createDataFrame(pts, "pid int, ts timestamp")
    idf = spark.createDataFrame(ivs, "iid int, lo timestamp, hi timestamp")
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(pdf, idf, "ts", "lo", "hi", 60).collect()
    )
    want = sorted(
        (pid, iid)
        for pid, ts in pts
        for iid, lo, hi in ivs
        if lo <= ts <= hi
    )
    assert got == want


# ---------------------------------------------------------------- xlsx


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(
                st.none(),
                st.floats(
                    allow_nan=False,
                    allow_infinity=False,
                    min_value=-1e12,
                    max_value=1e12,
                ),
            ),
            st.one_of(
                st.none(),
                st.text(
                    alphabet=st.characters(
                        blacklist_categories=("Cs", "Cc")
                    ),
                    max_size=40,
                ),
            ),
            st.booleans(),
        ),
        max_size=25,
    )
)
@settings(max_examples=50, deadline=None)
def test_xlsx_codec_roundtrips_any_payload(rows, tmp_path_factory):
    """write_xlsx -> read_xlsx is lossless for floats, arbitrary
    unicode strings (XML escaping), None gaps, and booleans."""
    import io

    from biglake_iceberg_pipeline_spark.sources.xlsx_lite import (
        read_xlsx,
        write_xlsx,
    )

    buf = io.BytesIO()
    write_xlsx(buf, ["num", "txt", "flag"], rows)
    buf.seek(0)
    header, got = read_xlsx(buf.read())
    assert header == ["num", "txt", "flag"]
    assert len(got) == len(rows)
    for (num, txt, flag), out in zip(rows, got):
        assert out[0] == num
        assert out[1] == txt
        assert out[2] is flag


@given(
    vals=st.lists(
        st.floats(
            allow_nan=False,
            allow_infinity=False,
            min_value=-1e9,
            max_value=1e9,
        ),
        min_size=1,
        max_size=20,
    ),
    digits=st.integers(min_value=0, max_value=4),
)
@settings(max_examples=30, deadline=None)
def test_money_round_matches_duckdb_bitwise(vals, digits):
    """floor(x*10^d+0.5)/10^d computed by DuckDB equals the same
    IEEE op sequence in Python — the cross-engine determinism the
    oracle parity relies on (Spark executes the identical ops)."""
    import math

    import duckdb

    from biglake_iceberg_pipeline_spark.functions.numeric import (
        money_round_sql,
    )

    con = duckdb.connect()
    scale = float(10**digits)
    for v in vals:
        got = con.execute(
            f"SELECT {money_round_sql('?::DOUBLE', digits)}", [v]
        ).fetchone()[0]
        want = math.floor(v * scale + 0.5) / scale
        assert got == want or (math.isnan(got) and math.isnan(want))


_pack_rows = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 50)),
    max_size=20,
)


@given(rows=_pack_rows, cap=st.integers(1, 64))
@settings(**_SETTINGS)
def test_pack_sequences_equals_sequential_reference(spark, rows, cap):
    """pack_sequences ≡ a sequential single-node layout: sort by id,
    accumulate token offsets, split at cap. Random sizes include
    zero-token docs, docs larger than cap (multi-sequence straddles),
    and duplicate ids (collapsed to one row — last write wins in the
    dict, matching distinct input assumption via dedup)."""
    from biglake_iceberg_pipeline_spark.operators.packing import (
        pack_sequences,
    )

    # unique ids: packing is defined over a keyed corpus
    uniq = {}
    for i, n in rows:
        uniq[i] = n
    if not uniq:
        return
    want = {}
    start = 0
    for i in sorted(uniq):
        want[i] = (start // cap, start % cap)
        start += uniq[i]
    df = spark.createDataFrame(
        list(uniq.items()), "doc_id long, n_tokens long"
    )
    got = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"])
        for r in pack_sequences(df, "doc_id", "n_tokens", cap=cap).collect()
    }
    assert got == want


_docs = st.lists(
    st.tuples(
        st.integers(0, 30),                      # doc id
        st.text(alphabet="abcd ", max_size=12),  # tiny alphabet => dense overlap
        st.sampled_from(["s1", "s2"]),           # partition
    ),
    max_size=14,
)


@given(rows=_docs, t=st.sampled_from([0.07, 0.3, 0.5, 0.7, 0.9, 1.0]))
@settings(**_SETTINGS)
def test_ngram_jaccard_equals_naive_reference(spark, rows, t):
    """The prefix-filtered set-similarity join ≡ a naive Python
    all-pairs reference, across thresholds including ones whose
    double product overshoots (0.07) and degenerate docs (empty,
    shorter than n, identical)."""
    from biglake_iceberg_pipeline_spark.operators import dedup as D

    uniq = {}
    for i, txt, src in rows:
        uniq[i] = (txt, src)
    if not uniq:
        return

    def grams(s):
        s = s.lower()
        m = max(len(s) - 2, 1)
        return set(s[i : i + 3] for i in range(m))

    want = set()
    ids = sorted(uniq)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            (ta_, sa), (tb_, sb) = uniq[a], uniq[b]
            if sa != sb:
                continue
            ga, gb = grams(ta_), grams(tb_)
            j = round(len(ga & gb) / len(ga | gb), 4)
            if j >= t:
                want.add((a, b, j))
    df = spark.createDataFrame(
        [(i, txt, src) for i, (txt, src) in uniq.items()],
        "doc_id long, text string, source string",
    )
    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in D.ngram_jaccard_pairs(
            df, "doc_id", "text", "source", 3, t
        ).collect()
    }
    assert got == want
