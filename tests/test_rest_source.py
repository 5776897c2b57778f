"""REST source + rawload sink tests (sources/rest.py)."""

from __future__ import annotations

import os

import pytest

from dbt_economic_indicators_eu_spark.sources.rest import (
    build_url,
    fetch_datasets,
    load_raw,
)


def test_build_url_repeats_list_params():
    url = build_url("http://x/api", "nama_10_gdp", {"geo": ["DE", "FR"], "format": "JSON"})
    assert url == "http://x/api/nama_10_gdp?geo=DE&geo=FR&format=JSON"


def test_fetch_datasets_injected_transport(spark):
    calls = []

    def fake(url, params):
        calls.append(url)
        return '{"ok": true}'

    df = fetch_datasets(spark, ["a", "b"], fetch_fn=fake, base_url="http://x")
    rows = {r.dataset_code: r.payload for r in df.collect()}
    assert rows == {"a": '{"ok": true}', "b": '{"ok": true}'}
    assert calls == ["http://x/a", "http://x/b"]


def test_fetch_datasets_retries_then_raises(spark):
    attempts = []

    def flaky(url, params):
        attempts.append(url)
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        fetch_datasets(spark, ["a"], fetch_fn=flaky, base_url="http://x", retries=2)
    assert len(attempts) == 3  # initial + 2 retries


def test_load_raw_create_append_full_refresh(spark, tmp_path):
    path = os.path.join(str(tmp_path), "raw")
    one = spark.createDataFrame([(1, "a")], "id bigint, v string")
    two = spark.createDataFrame([(2, "b")], "id bigint, v string")

    assert load_raw(one, path).count() == 1  # create-if-absent
    assert load_raw(two, path).count() == 2  # append
    assert load_raw(one, path, full_refresh=True).count() == 1  # drop+reload
