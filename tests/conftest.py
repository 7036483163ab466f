from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from osrs_dashboard_elt_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="osrs-elt-tests",
        master="local[4]",
        extra_conf={
            "spark.sql.shuffle.partitions": "4",
            "spark.ui.enabled": "false",
        },
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
