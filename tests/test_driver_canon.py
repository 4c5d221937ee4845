"""Driver-shaped canonicalization round-trip for the rows-only queries.

The round driver records a weaker rows-only check for queries without an
oracle — but it still runs ``toPandas`` on the result and feeds it
through its canonicalizer (sort columns by name, normalize list cells,
sort rows, hash values). Round 1 recorded ERR for two queries whose
output cells (numpy arrays / structs) broke that path, and the driver's
sweep window may never revisit the rows-only tail — so this test runs
the EXACT local-mini-driver canonicalizer (``tools/check_correctness
.canon``) over every rows-only registry query at sf0.001 and asserts it
produces a hashable frame. Any cell type the canonicalizer cannot sort
or stringify fails here instead of in a driver round we can't rerun.
"""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from data_engineering_spark import registry  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

ROWS_ONLY = [n for n in registry.QUERIES if n not in registry.ORACLE]


def test_rows_only_tail_is_nonempty():
    # the registry currently carries 16 rows-only queries; if that ever
    # drops to zero this module is dead code and should be removed
    assert len(ROWS_ONLY) >= 10


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_survives_driver_canonicalizer(spark, name):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from check_correctness import canon

    fn = entrymod.queries()[name]
    pdf = fn(spark, SF_DIR).toPandas()
    spark.catalog.clearCache()
    c = canon(pdf)
    # the driver hashes stringified values after canon — any cell the
    # canonicalizer left unsortable/unstringifiable throws here
    digest = pd.util.hash_pandas_object(c.astype(str), index=False).sum()
    assert isinstance(int(digest), int)
