from __future__ import annotations

import shutil
import sys
from pathlib import Path

import pytest

sys.path.insert(0, "/root/repo")

from sql_data_warehouse_analytics_project_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # A crashed previous run can leave managed-table directories behind while
    # the (in-memory) metastore forgets them, making saveAsTable fail with
    # LOCATION_ALREADY_EXISTS. The warehouse dir is pure test scratch — start
    # each session from a clean slate before the JVM pins it.
    shutil.rmtree(Path("/root/repo/spark-warehouse"), ignore_errors=True)
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE
