"""Registry-wide unpartitioned-window gate (VERDICT r10 item 2).

Round 10 shipped a single-partition corpus-sized window in
operators/fusion.py while operators/kmv.py documented and avoided the
exact same trap — discipline that lives only in docstrings does not
generalize. This gate makes the whole CLASS of defect a CI failure:
for EVERY registered query, walk the executed plan and flag any
WindowExec with an empty partitionSpec whose subtree reaches a scan
with no intervening cardinality bound (TakeOrderedAndProject / limit /
WindowGroupLimit). Such a window funnels its entire input through one
task — fine at sf0.1, fatal at 10^10 rows.

The allowlist is for frames that ARE bounded, just not by a limit
node the walker can see — each entry names the structural bound and
the module that documents it. Growth of this list is a review event:
a new entry must argue its frame is cluster-sized or
resolution-sized, never corpus-sized.

Like the parity sweep, this runs under ``-m parity`` (plan building
is cheap; a few queries execute driver-side index builds).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aoseventstreamer_spark.plans.inspect import (  # noqa: E402
    unbounded_global_window_sites,
)
from aoseventstreamer_spark.queries import QUERIES  # noqa: E402

pytestmark = pytest.mark.parity

# query -> why its flagged window frame is bounded WITHOUT a limit node.
ALLOWLIST: dict[str, str] = {
    # operators/packing.py phase 2: the window runs over per-BLOCK
    # totals — one row per `block_size` (10^6) ids, so the frame is
    # corpus/10^6 rows of two longs (16 KB per 10^9 docs). Documented
    # in packing.py's module docstring; correctness is block_size-
    # independent (tested), so the bound is tunable.
    "q_pack_sequences": "per-block totals frame: corpus/block_size rows",
    # operators/quantile.py qsketch_quantiles: both windows run over
    # the SKETCH (log-bucketed counts), whose cardinality is bounded
    # by the bucket resolution (k per decade x value range), never by
    # the sketched data. Documented at quantile.py:145-152.
    "q_quantile_merge": "sketch bucket frame: resolution-bounded",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unbounded_global_window(name, spark, sf_dir):
    # plan-shape checks need a clean CacheManager: a frame persisted
    # by an earlier test substitutes InMemoryTableScans into matching
    # subtrees, which can hide (or fake) the bound the walker looks
    # for (same hygiene as tests/test_plans.py's scan-line tests)
    spark.catalog.clearCache()
    sites = unbounded_global_window_sites(QUERIES[name](spark, sf_dir))
    if name in ALLOWLIST:
        # the allowlist documents a KNOWN bounded frame; if the plan
        # stops flagging (e.g. a rewrite removed the window), drop the
        # entry so the list never accumulates dead rows
        assert sites, (
            f"{name} is allowlisted but its plan is clean — remove the "
            "ALLOWLIST entry"
        )
        return
    assert not sites, (
        f"{name}: unpartitioned window over an unbounded frame — use "
        "orderBy().limit(k) before ranking (operators/kmv.py:58, "
        "operators/fusion.py) or the two-phase global rank "
        f"(operators/ranking.py). Sites: {sites}"
    )
