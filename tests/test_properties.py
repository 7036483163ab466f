"""Property tests (SURVEY.md §5.3) for the order-sensitive semantics:
later-rule-wins remapping, keep-first dedup equivalence, duration
parsing, and MinHash banding — each against an independent Python
model."""

from __future__ import annotations

import datetime as dt
import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.functions.durations import duration_seconds
from osrs_dashboard_elt_spark.operators.dedup import (
    MINHASH_P,
    dedup_keep_first,
    dedup_keep_first_asc,
    minhash_lsh_pairs,
    minhash_params,
)
from osrs_dashboard_elt_spark.operators.remap import (
    MappingRule,
    apply_mapping,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _t0(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=day)


_NAMES = ["u0", "u1", "u2", "u3"]

_rules_st = st.lists(
    st.tuples(
        st.sampled_from(["t0", "t1", "u0"]),  # target (may equal a source)
        st.lists(st.sampled_from(_NAMES), min_size=1, max_size=3, unique=True),
        st.one_of(st.none(), st.integers(0, 20)),  # start day
        st.one_of(st.none(), st.integers(0, 20)),  # end day
    ),
    max_size=4,
)
_events_st = st.lists(
    st.tuples(st.sampled_from(_NAMES), st.integers(0, 20)), min_size=1, max_size=12
)


@SETTINGS
@given(rules=_rules_st, events=_events_st)
def test_remap_later_rule_wins_model(spark, rules, events):
    """The compiled when-chain matches a Python model that scans rules
    in REVERSE order and applies the first match to the original
    value (later-rule-wins, reference config doc :96-97)."""
    mrules = [
        MappingRule(
            target=t,
            sources=tuple(srcs),
            start=None if s is None else _t0(s),
            end=None if e is None else _t0(e),
        )
        for t, srcs, s, e in rules
    ]

    def model(name: str, day: int) -> str:
        for t, srcs, s, e in reversed(rules):
            if name in srcs and (s is None or day >= s) and (e is None or day < e):
                return t
        return name

    df = spark.createDataFrame(
        [(n, _t0(d)) for n, d in events], "Username string, ts timestamp"
    )
    out = apply_mapping(df, "ts", ["Username"], mrules)
    got = [(r["Username"]) for r in out.orderBy("ts", "Username").collect()]
    # compare as multisets keyed by input order-independent sort
    want = sorted(model(n, d) for n, d in events)
    assert sorted(got) == want


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 3),  # key
            st.integers(0, 5),  # order value (ties likely)
            st.integers(0, 100),  # payload
        ),
        min_size=1,
        max_size=20,
    )
)
def test_dedup_keep_first_asc_equals_window_form(spark, rows):
    """The hash-aggregate keep-first (min of ordered struct) picks the
    same rows as the window row_number form whenever the full
    (order, payload) tuple disambiguates ties."""
    df = spark.createDataFrame(rows, "k int, o int, v int")
    agg = {
        (r["k"], r["o"], r["v"])
        for r in dedup_keep_first_asc(df, ["k"], ["o", "v"]).collect()
    }
    win = {
        (r["k"], r["o"], r["v"])
        for r in dedup_keep_first(
            df, ["k"], [F.col("o").asc(), F.col("v").asc()]
        ).collect()
    }
    assert agg == win


@SETTINGS
@given(
    parts=st.lists(st.integers(0, 99), min_size=1, max_size=3),
    frac=st.one_of(st.none(), st.integers(0, 99)),
)
def test_duration_parse_model(spark, parts, frac):
    s = ":".join(str(p) for p in parts)
    if frac is not None:
        s += f".{frac:02d}"
    mults = [1, 60, 3600]
    want = sum(p * m for p, m in zip(reversed(parts), mults))
    if frac is not None:
        want += frac / 100.0
    df = spark.createDataFrame([(s,)], "d string")
    got = df.select(duration_seconds(F.col("d")).alias("s")).collect()[0]["s"]
    assert got == pytest.approx(want, abs=1e-9)


def _py_token_hash(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d", "e"]), min_size=3, max_size=8),
        min_size=2,
        max_size=6,
    )
)
def test_minhash_banding_matches_python_model(spark, docs):
    """LSH candidate pairs == a Python model computing the same
    md5-derived minhash signatures and band keys (any shared band)."""
    num_perm, bands, seed, n = 8, 4, 7, 2
    rows = num_perm // bands
    params = minhash_params(num_perm, seed)

    def shingles(words):
        return list(dict.fromkeys(
            " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
        ))

    def sig(words):
        hs = [_py_token_hash(t) for t in shingles(words)]
        return [min((a * h + b) % MINHASH_P for h in hs) for a, b in params]

    sigs = {i: sig(w) for i, w in enumerate(docs)}
    want = set()
    for i in sigs:
        for j in sigs:
            if i >= j:
                continue
            for b in range(bands):
                if sigs[i][b * rows : (b + 1) * rows] == sigs[j][b * rows : (b + 1) * rows]:
                    want.add((i, j))
                    break

    df = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in enumerate(docs)], "id long, text string"
    )
    out = minhash_lsh_pairs(
        df, "id", "text", num_perm=num_perm, bands=bands, seed=seed, shingle_n=n
    )
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert got == want


# ---------------------------------------------------------------------------
# Round-3 operators vs independent Python models
# ---------------------------------------------------------------------------

_scd2_rows_st = st.lists(
    st.tuples(
        st.sampled_from(["k1", "k2"]),        # key
        st.integers(0, 10),                    # day
        st.sampled_from(["A", "B", None]),     # attribute (nullable)
    ),
    min_size=1,
    max_size=20,
)


def _scd2_model(rows):
    """Brute-force SCD2: per key, sort by (ts, attr-with-null-first),
    collapse consecutive equal attrs, version + valid_to."""
    out = []
    bykey = {}
    for k, day, a in rows:
        bykey.setdefault(k, []).append((day, a))
    for k, items in bykey.items():
        items.sort(key=lambda t: (t[0], t[1] is not None, t[1] or ""))
        runs = []
        prev = object()
        for day, a in items:
            if a != prev:
                runs.append([day, a])
                prev = a
        for i, (day, a) in enumerate(runs):
            valid_to = runs[i + 1][0] if i + 1 < len(runs) else None
            out.append((k, a, _t0(day), _t0(valid_to) if valid_to is not None else None, i + 1))
    return sorted(out, key=lambda r: (r[0], r[4]))


@given(_scd2_rows_st)
@SETTINGS
def test_scd2_matches_model(spark, rows):
    from osrs_dashboard_elt_spark.operators.scd2 import scd2_compress

    df = spark.createDataFrame(
        [(k, _t0(d), a) for k, d, a in rows], "k string, ts timestamp, a string"
    )
    got = sorted(
        ((r.k, r.a, r.valid_from, r.valid_to, r.version) for r in scd2_compress(
            df, key="k", attr="a", ts_col="ts"
        ).collect()),
        key=lambda r: (r[0], r[4]),
    )
    # the model orders ties (same ts) nulls-first like Spark ASC NULLS FIRST
    assert got == _scd2_model(rows)


_rolling_rows_st = st.lists(
    st.tuples(
        st.sampled_from(["u1", "u2"]),
        st.integers(0, 2000),                  # epoch second
        st.integers(-100, 100),                # value (integral: exact sums)
    ),
    min_size=1,
    max_size=25,
)


@given(_rolling_rows_st, st.integers(1, 600))
@SETTINGS
def test_rolling_range_matches_model(spark, rows, win):
    from osrs_dashboard_elt_spark.operators.rolling import rolling_range_agg

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, k, base + dt.timedelta(seconds=s), float(v))
            for i, (k, s, v) in enumerate(rows)
        ],
        "id long, k string, ts timestamp, v double",
    )
    out = rolling_range_agg(df, key="k", ts_col="ts", value_col="v", window_seconds=win)
    got = {r.id: (r.rolling_sum, r.rolling_cnt) for r in out.collect()}
    for i, (k, s, v) in enumerate(rows):
        inwin = [
            v2 for (k2, s2, v2) in rows if k2 == k and s - win <= s2 <= s
        ]
        assert got[i] == (float(sum(inwin)), len(inwin)), (i, rows, win)


_hll_vals_st = st.lists(st.integers(0, 500), min_size=0, max_size=60)


@given(_hll_vals_st)
@SETTINGS
def test_hll_partition_invariance_and_bounds(spark, vals):
    from osrs_dashboard_elt_spark.operators.sketches import hll_distinct

    if not vals:
        return
    df = spark.createDataFrame(
        [("g", v) for v in vals], "g string, v long"
    )
    a = hll_distinct(df.repartition(1), "g", "v", p=9).collect()[0].approx_distinct
    b = hll_distinct(df.repartition(7), "g", "v", p=9).collect()[0].approx_distinct
    assert a == b
    true = len(set(vals))
    assert abs(a - true) / max(true, 1) < 0.25


# ---------------------------------------------------------------------------
# Fourth-wave operators vs independent models
# ---------------------------------------------------------------------------


def _lev1(a: str, b: str) -> bool:
    """Model: levenshtein distance <= 1."""
    if a == b:
        return True
    if len(a) == len(b):
        return sum(x != y for x, y in zip(a, b)) == 1
    if abs(len(a) - len(b)) == 1:
        s, l = (a, b) if len(a) < len(b) else (b, a)
        for i in range(len(l)):
            if l[:i] + l[i + 1 :] == s:
                return True
    return False


_digits_st = st.lists(
    st.text(alphabet="0123456789", min_size=9, max_size=9),
    min_size=1,
    max_size=12,
    unique=True,
)


@SETTINGS
@given(left=_digits_st, right=_digits_st)
def test_wildcard_blocking_is_complete(spark, left, right):
    """The wildcard-neighborhood candidate set must contain EVERY pair
    within substitution distance 1 (equal-length keys): compare the
    full join output against a brute-force model."""
    from pyspark.sql import functions as F

    from osrs_dashboard_elt_spark.suite import _wildcard_keys

    l = spark.createDataFrame([(x,) for x in left], "a string").select(
        "a", F.explode(_wildcard_keys("a", 9)).alias("bkey")
    )
    r = spark.createDataFrame([(y,) for y in right], "b string").select(
        "b", F.explode(_wildcard_keys("b", 9)).alias("bkey")
    )
    cand = (
        l.join(r, "bkey")
        .select("a", "b")
        .distinct()
        .filter(F.levenshtein("a", "b") <= 1)
    )
    got = {(x.a, x.b) for x in cand.collect()}
    want = {(x, y) for x in left for y in right if _lev1(x, y)}
    assert got == want


@SETTINGS
@given(
    vals=st.lists(st.integers(0, 30), min_size=1, max_size=200),
    w=st.sampled_from([4, 16, 64]),
)
def test_cms_estimate_matches_model(spark, vals, w):
    """The CMS estimate equals the model's min-over-rows bucket sum —
    the sketch is deterministic, not just approximately right."""
    import hashlib as _h

    from osrs_dashboard_elt_spark.operators.sketches import cms_heavy_hitters

    d = 3
    df = spark.createDataFrame([(v,) for v in vals], "k INT")
    got = {
        r.val: (r.est, r.exact)
        for r in cms_heavy_hitters(df, "k", threshold=0, d=d, w=w).collect()
    }

    def bucket(j, v):
        return int(_h.md5(f"{j}:{v}".encode()).hexdigest()[:15], 16) % w

    regs: dict = {}
    for v in vals:
        for j in range(d):
            key = (j, bucket(j, v))
            regs[key] = regs.get(key, 0) + 1
    from collections import Counter

    exact = Counter(str(v) for v in vals)
    for v in set(vals):
        est_model = min(regs[(j, bucket(j, v))] for j in range(d))
        assert got[str(v)] == (est_model, exact[str(v)])


_change_st = st.lists(
    st.tuples(
        st.integers(0, 9),  # key
        st.sampled_from(["I", "U", "D"]),
        st.integers(0, 99),  # payload
    ),
    max_size=8,
)


@SETTINGS
@given(
    base=st.dictionaries(st.integers(0, 9), st.integers(0, 99), max_size=6),
    changes=_change_st,
    upsert=st.booleans(),
)
def test_merge_apply_matches_model(spark, base, changes, upsert):
    """merge_apply vs a dict-based model of MERGE semantics."""
    from osrs_dashboard_elt_spark.operators.cdc import merge_apply

    # dedupe change keys (merge_apply rejects duplicates by contract)
    seen: dict = {}
    for k, op, v in changes:
        seen[k] = (op, v)
    target = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(None, None)],
        "k INT, v INT",
    ).filter(F.col("k").isNotNull())
    cdf = spark.createDataFrame(
        [(k, v, op) for k, (op, v) in seen.items()] or [(None, None, None)],
        "k INT, v INT, op STRING",
    ).filter(F.col("k").isNotNull())

    model = dict(base)
    for k, (op, v) in seen.items():
        if op == "D":
            model.pop(k, None)
        elif op == "U":
            if k in base:
                model[k] = v
            elif upsert:
                model[k] = v
        elif op == "I" and k not in base:
            model[k] = v
    got = {
        r.k: r.v
        for r in merge_apply(target, cdf, ["k"], upsert=upsert).collect()
    }
    assert got == model


_edges_st = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)),
    max_size=20,
)


@SETTINGS
@given(edges=_edges_st)
def test_connected_components_matches_union_find(spark, edges):
    """Hop+shortcut labeling equals an independent union-find over
    random graphs (self-loops and duplicate edges included)."""
    from osrs_dashboard_elt_spark.operators.components import (
        connected_components,
    )

    n = 15
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min vertex of the component
    comp = {}
    for v in range(n):
        root = find(v)
        comp.setdefault(root, []).append(v)
    expected = {v: min(vs) for vs in comp.values() for v in vs}

    vertices = spark.createDataFrame([(i,) for i in range(n)], "id BIGINT")
    e_df = spark.createDataFrame(
        edges or [(0, 0)], "id_a BIGINT, id_b BIGINT"
    )
    got = {
        r.id: r.component
        for r in connected_components(vertices, e_df).collect()
    }
    assert got == expected


_baskets_st = st.lists(
    st.tuples(st.integers(1, 5), st.integers(0, 9)),  # (order, item)
    min_size=1,
    max_size=30,
)


@SETTINGS
@given(rows=_baskets_st, cap=st.integers(2, 12))
def test_copurchase_matches_bruteforce_under_cap(spark, rows, cap):
    """Pair supports equal itertools brute force computed over the
    same capped (sorted, distinct, first-cap) baskets."""
    import itertools
    from collections import Counter

    from osrs_dashboard_elt_spark.operators.baskets import copurchase_pairs

    baskets: dict[int, set] = {}
    for o, i in rows:
        baskets.setdefault(o, set()).add(i)
    expected = Counter()
    for items in baskets.values():
        capped = sorted(items)[:cap]
        for a, b in itertools.combinations(capped, 2):
            expected[(a, b)] += 1

    df = spark.createDataFrame(rows, "order_id INT, item INT")
    got = {
        (r.item_a, r.item_b): r.n_orders
        for r in copurchase_pairs(
            df, "order_id", "item", min_support=1, max_basket=cap
        ).collect()
    }
    assert got == dict(expected)


_pos_rows_st = st.lists(
    st.integers(-1000, 1000), min_size=1, max_size=40, unique=True
)


@SETTINGS
@given(keys=_pos_rows_st)
def test_with_global_position_matches_enumerate(spark, keys):
    """pos over arbitrary unique keys equals sorted-enumerate."""
    from osrs_dashboard_elt_spark.operators.sampling import (
        with_global_position,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k BIGINT")
    got = {
        r.k: r.pos for r in with_global_position(df, ["k"]).collect()
    }
    expected = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert got == expected
