"""Physical-plan inspection helpers.

The engine's 100 TB acceptance criteria (SURVEY.md §4/§6) are plan
properties, not timings: subject predicates must reach the parquet
scan as PushedFilters, dimension joins must broadcast, hot paths must
stay inside WholeStageCodegen, and narrow pipelines must not shuffle.
These helpers turn those criteria into assertions usable from tests.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, pattern: str) -> bool:
    """True if the scan's PushedFilters line matches ``pattern`` (regex)."""
    plan = formatted_plan(df)
    for line in plan.splitlines():
        if "PushedFilters" in line and re.search(pattern, line):
            return True
    return False


def strip_cached_children(plan: str) -> str:
    """Drop every InMemoryRelation's printed child plan from a SIMPLE
    (toString) plan rendering: the renderer re-prints a cached frame's
    FULL build subtree at every reference, so textual operator counts
    inflate linearly with the number of cache reads even though the
    build executes once. What remains is the per-run RECURRING shape —
    the right text to assert iteration-plan properties on (used by the
    pagerank exchange gate and tools/plan_audit.py). Depth is the
    length of the tree-indent prefix (spaces / ':' rails) before the
    optional '+-'/'*-' marker; blank lines inside a stripped subtree
    are skipped rather than treated as depth 0."""
    out = []
    skip_deeper_than = None
    prefix = re.compile(r"^([ :]*)(?:[+\-*]{1,2} )?")
    for line in plan.splitlines():
        if skip_deeper_than is not None and not line.strip():
            continue
        depth = len(prefix.match(line).group(1))
        if skip_deeper_than is not None:
            if depth > skip_deeper_than:
                continue
            skip_deeper_than = None
        if "InMemoryRelation" in line:
            skip_deeper_than = depth
            continue
        out.append(line)
    return "\n".join(out)


def shuffle_count(df: DataFrame) -> int:
    """Number of exchange (shuffle) operators in the physical plan.
    AQE may later coalesce them, but a plan with 0 exchanges is
    guaranteed narrow."""
    plan = formatted_plan(df)
    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE))


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", formatted_plan(df)))


def codegen_stage_count(df: DataFrame) -> int:
    return len(set(re.findall(r"codegen id : (\d+)", formatted_plan(df))))


# ---------------------------------------------------------------------
# Global-window gate: no unpartitioned Window may sit on a corpus-sized
# frame. An empty-partitionBy window funnels ALL its input through one
# task (WindowExec "Moving all data to a single partition"), so its
# subtree must cardinality-bound every path to a scan with a limit-like
# node FIRST (orderBy+limit → TakeOrderedAndProject is the sanctioned
# pattern, operators/kmv.py:58-64 / operators/fusion.py). Round 10
# shipped exactly this defect in operators/fusion.py — the discipline
# existed in kmv but was forgotten in fusion — so the check is now
# mechanical (tests/test_window_gate.py walks every registry query).
# ---------------------------------------------------------------------

# Nodes that bound the row count flowing upward: anything above them
# sees at most k / broadcast-threshold rows regardless of corpus size.
_BOUNDING = {
    "TakeOrderedAndProjectExec",
    "GlobalLimitExec",
    "LocalLimitExec",
    "CollectLimitExec",
    "WindowGroupLimitExec",
}
# Leaf scans that are corpus-sized unless bounded on the way up.
_SCANS = {
    "FileSourceScanExec",
    "RowDataSourceScanExec",
    "BatchScanExec",
    "InMemoryTableScanExec",
    "ExternalRDDScanExec",
    "RDDScanExec",
}


def _unwrap(node):
    """Peel AQE / codegen / reuse wrappers to the semantic node."""
    name = node.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        return _unwrap(node.initialPlan())
    if name in ("WholeStageCodegenExec", "InputAdapter"):
        return _unwrap(node.child())
    if name == "ReusedExchangeExec":
        return _unwrap(node.child())
    return node


def _subtree_has_unbounded_scan(node) -> bool:
    node = _unwrap(node)
    name = node.getClass().getSimpleName()
    if name in _BOUNDING:
        return False  # everything below is cardinality-capped here
    if name in _SCANS:
        return True
    return any(
        _subtree_has_unbounded_scan(node.children().apply(i))
        for i in range(node.children().size())
    )


def unbounded_global_window_sites(df: DataFrame) -> list[str]:
    """Every WindowExec with an EMPTY partitionSpec whose subtree
    reaches a scan with no intervening limit-like bound — i.e. a
    single-task sort over a corpus-sized frame. Returns one
    description string per offending site ([] = plan is clean).
    Windows partitioned by anything, and global windows over
    already-bounded frames (post-limit ranks), pass."""
    plan = _unwrap(df._jdf.queryExecution().executedPlan())  # noqa: SLF001
    sites: list[str] = []

    def visit(node):
        node = _unwrap(node)
        name = node.getClass().getSimpleName()
        if name in ("WindowExec", "WindowInPandasExec") and (
            node.partitionSpec().size() == 0
        ):
            if any(
                _subtree_has_unbounded_scan(node.children().apply(i))
                for i in range(node.children().size())
            ):
                sites.append(
                    f"unpartitioned {name} over unbounded frame: "
                    + node.toString().splitlines()[0].strip()[:160]
                )
        for i in range(node.children().size()):
            visit(node.children().apply(i))

    visit(plan)
    return sites
