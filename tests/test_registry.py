"""Model registry: content-addressed versions, idempotent saves,
latest-by-seq loads, and a bit-exact round trip into a consumer
(operators/registry.py)."""

from __future__ import annotations

import pytest

from osrs_dashboard_elt_spark.operators.registry import (
    list_models,
    load_model,
    model_version,
    save_model,
)


def test_save_load_round_trip_exact_floats(spark, tmp_path):
    path = str(tmp_path / "reg")
    # awkward floats: repr-faithful JSON must round-trip these exactly
    w = [0.1 + 0.2, 1e-17, -0.3333333333333333, 2.0**-45]
    v = save_model(spark, path, "probe", "linear_probe", {"weights": w})
    got, gv = load_model(spark, path, "probe")
    assert gv == v
    assert got["weights"] == w  # bit-identical doubles


def test_idempotent_save_same_payload(spark, tmp_path):
    path = str(tmp_path / "reg")
    p = {"centroids": [[1.0, 2.0], [3.0, 4.0]]}
    v1 = save_model(spark, path, "km", "kmeans", p)
    v2 = save_model(spark, path, "km", "kmeans", p)
    assert v1 == v2
    rows = spark.read.parquet(path).filter("name = 'km'").collect()
    assert len(rows) == 1  # no duplicate row


def test_latest_by_seq_and_pinned_version(spark, tmp_path):
    path = str(tmp_path / "reg")
    v1 = save_model(spark, path, "bpe", "bpe_merges", {"merges": [["a", "b"]]})
    v2 = save_model(
        spark, path, "bpe", "bpe_merges", {"merges": [["a", "b"], ["ab", "c"]]}
    )
    assert v1 != v2
    latest, lv = load_model(spark, path, "bpe")
    assert lv == v2 and len(latest["merges"]) == 2
    pinned, pv = load_model(spark, path, "bpe", version=v1)
    assert pv == v1 and len(pinned["merges"]) == 1


def test_version_is_order_insensitive(spark):
    assert model_version({"a": 1, "b": [2.5]}) == model_version(
        {"b": [2.5], "a": 1}
    )


def test_missing_model_raises(spark, tmp_path):
    with pytest.raises(KeyError, match="no model"):
        load_model(spark, str(tmp_path / "reg"), "ghost")


def test_list_models(spark, tmp_path):
    path = str(tmp_path / "reg")
    save_model(spark, path, "a", "kmeans", {"c": [1.0]})
    save_model(spark, path, "a", "kmeans", {"c": [2.0]})
    save_model(spark, path, "b", "pq", {"books": []})
    got = {r["name"]: r for r in list_models(spark, path).collect()}
    assert got["a"]["n_versions"] == 2
    assert got["b"]["n_versions"] == 1
    assert got["a"]["latest_version"] == model_version({"c": [2.0]})


def test_loaded_model_drives_consumer_bit_exact(spark, tmp_path):
    """The point of the registry: a model saved in one session scores
    identically when loaded — weights survive JSON round-trip at full
    precision."""
    from osrs_dashboard_elt_spark.operators.classifier import (
        linear_probe_fit,
        linear_probe_scores,
    )

    df = spark.createDataFrame(
        [(i, [0.25 * (i % 4), 0.5, 0.125 * (i % 3)], i % 2) for i in range(30)],
        "vec_id bigint, embedding array<double>, y int",
    )
    w = linear_probe_fit(df, "embedding", "y", dim=3, n_iter=3)
    path = str(tmp_path / "reg")
    save_model(spark, path, "p", "linear_probe", {"weights": w})
    loaded, _ = load_model(spark, path, "p")
    a = linear_probe_scores(df, "embedding", "y", w, id_col="vec_id").collect()
    b = linear_probe_scores(
        df, "embedding", "y", loaded["weights"], id_col="vec_id"
    ).collect()
    assert a == b
