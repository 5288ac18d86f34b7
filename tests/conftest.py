from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from schemamap_spark.session import get_spark  # noqa: E402

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("schemamap-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def engine(spark):
    from schemamap_spark import SchemamapEngine
    from schemamap_spark.catalog import FixtureCatalog

    return SchemamapEngine(spark, FixtureCatalog(spark))
