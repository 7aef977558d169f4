"""Full-table vs row-filtered stability of every fold-based DuckDB
oracle (VERDICT r9 #7).

DuckDB 1.0.0's list_reduce can mis-assign lambda results ACROSS ROWS
when per-row iteration counts differ within a vector chunk — the
x5_unigram_em sf0.001 defect (judge-root-caused round 9: `customer`
received `spark`'s segmentation).  The hazard is chunk-layout-
dependent, so a query can hash-green at one scale and break at
another.  This file pins the invariant directly: for each fold site
(plans/extended.FOLD_PROBES), running the fold over a filtered subset
of keys must reproduce exactly the full-table rows for those keys —
with every model input (seed scores, merge pair) held fixed from the
full data so the ONLY difference is chunk layout.
"""

import os

import duckdb
import pytest

from diepy_spark.plans.extended import FOLD_PROBES
from diepy_spark.sources.registry import TABLES

# Two different splits so the filtered chunks pack differently: a
# ~half split and a sparse ~1/8 split on an md5 nibble of the key.
_FILTERS = {
    "half": "substring(md5(CAST({key} AS VARCHAR)), 1, 1) <= '7'",
    "sparse": "substring(md5(CAST({key} AS VARCHAR)), 1, 1) <= '1'",
}


@pytest.fixture(scope="module")
def duck(sf_small):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_small, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _rows(con, sql):
    return dict(con.execute(sql).fetchall())


@pytest.mark.parametrize("split", sorted(_FILTERS))
@pytest.mark.parametrize("probe", sorted(FOLD_PROBES))
def test_fold_full_vs_filtered(probe, split, duck):
    template, key = FOLD_PROBES[probe]
    full = _rows(duck, template.format(flt="TRUE"))
    assert len(full) >= 3, f"{probe}: probe needs enough keys to chunk"
    flt = _FILTERS[split].format(key=key)
    sub = _rows(duck, template.format(flt=flt))
    assert 0 < len(sub) < len(full), f"{probe}/{split}: filter is trivial"
    mismatches = {
        k: (full[k], v) for k, v in sub.items() if full.get(k) != v
    }
    assert not mismatches, (
        f"{probe}/{split}: list_reduce cross-row contamination — "
        f"{len(mismatches)} keys differ, e.g. "
        f"{dict(list(mismatches.items())[:3])}"
    )
