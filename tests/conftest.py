import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from ocgis_spark.session import get_spark

    s = get_spark("ocgis_spark_tests", cpus=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def golden_cells(spark):
    """The reference make_test_data 4x4/1° grid as a DataFrame:
    (cell_y, cell_x, value) with quadrant values 1 NW / 2 NE / 3 SW / 4 SE."""
    rows = []
    for cy in range(4):
        for cx in range(4):
            north, east = cy >= 2, cx >= 2
            val = 1.0 if (north and not east) else 2.0 if north else 3.0 if not east else 4.0
            rows.append((cy, cx, val))
    return spark.createDataFrame(rows, "cell_y int, cell_x int, value double")
