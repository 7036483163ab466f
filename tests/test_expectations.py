"""Row-level expectations (operators/quality.py additions):
violation counts in one scan, NULL-as-violation semantics, row
routing with failure reasons, referential anti-join."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from osrs_dashboard_elt_spark.operators.quality import (
    referential_violations,
    rule_violation_counts,
    split_by_rules,
)

ROWS = [
    (1, 10.0, "A"),
    (2, -5.0, "A"),     # price violation
    (3, None, "B"),     # NULL price: predicate NULL -> violation
    (4, 7.0, "X"),      # flag violation
    (5, -1.0, None),    # price AND flag violations
]
SCHEMA = "id long, price double, flag string"
RULES = [
    ("price_pos", "price > 0"),
    ("flag_domain", "flag IN ('A','B')"),
]


def test_rule_violation_counts_nulls_count(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    got = {
        r.rule: (r.n_violations, r.n_rows)
        for r in rule_violation_counts(df, RULES).collect()
    }
    assert got == {"price_pos": (3, 5), "flag_domain": (2, 5)}


def test_split_by_rules_routes_with_reasons(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    good, bad = split_by_rules(df, RULES)
    assert {r.id for r in good.collect()} == {1}
    reasons = {r.id: sorted(r.failed_rules) for r in bad.collect()}
    assert reasons == {
        2: ["price_pos"],
        3: ["price_pos"],
        4: ["flag_domain"],
        5: ["flag_domain", "price_pos"],
    }
    # routing is a scan-side projection: no Exchange in either plan
    for frame in (good, bad):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_referential_violations_finds_orphans_and_null_fks(spark):
    fact = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long"
    )
    dim = spark.createDataFrame([(10,), (20,)], "pk long")
    got = referential_violations(fact, "fk", dim, "pk")
    assert {r.id for r in got.collect()} == {3, 4}  # orphan AND null fk
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_corpus_gate_rules_on_crafted_docs(spark):
    """Each gate fires on its crafted violator and passes clean prose;
    the whole pack is one aggregate."""
    from osrs_dashboard_elt_spark.operators.quality import (
        corpus_gate_rules,
        rule_violation_counts,
        split_by_rules,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over a lazy dog in the sun"),
            (2, "too short"),                              # min_words
            (3, "the " + "supercalifragilistic" * 2 + " word appears in a story here"),  # mean ok, fine
            (4, "the " + "x" * 150 + " is one giant token in a sentence"),  # max_word_len
            (5, "the @@##$$ %%^^&& !!(()) ;;;;;; ::::: of a symbols"),  # symbol_ratio
            (6, "zqx vbn mlp qwe rty uio asd fgh jkl"),    # has_stopword
            (7, None),                                     # null: all gates
        ],
        "doc_id long, text string",
    )
    rules = corpus_gate_rules()
    got = {
        r.rule: r.n_violations
        for r in rule_violation_counts(docs, rules).collect()
    }
    assert got["min_words"] == 2      # doc 2 + null
    assert got["max_word_len"] == 2   # doc 4 + null
    assert got["symbol_ratio"] == 2   # doc 5 + null
    assert got["has_stopword"] == 3   # doc 6 + null + "too short"
    good, bad = split_by_rules(docs, rules)
    assert {r.doc_id for r in good.collect()} == {1, 3}
    reasons = {r.doc_id: set(r.failed_rules) for r in bad.collect()}
    assert reasons[7] == {n for n, _ in rules}  # null fails every gate
