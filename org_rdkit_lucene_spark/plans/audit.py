"""Physical-plan audit helpers — the 100 TB design contract, checkable.

The engine's scale story rests on plan properties, not hope:

- postings scans must PRUNE to the query's terms (``PushedFilters:
  [In(term, ...)]`` reaching the parquet scan) — the Spark analog of
  Lucene seeking the term dictionary instead of scanning segments;
- the small sides of every query join (tokenized queries, the pruned
  lexicon slice, top-k results) must BROADCAST, never sort-merge;
- column programs (quality scoring, language ID, token counts, exact
  dedup) must stay inside whole-stage codegen — no Python evaluator
  nodes in the hot path;
- shuffle count per operator is a budget: exact dedup is ONE exchange
  on the digest, the SPIMI merge is ONE exchange on (salted) term.

``tests/test_plans.py`` pins these properties so a regression that
silently de-optimizes a plan (lost pushdown, join strategy flip,
accidental row-at-a-time UDF) fails CI rather than surfacing as a 10x
slowdown at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`explain("formatted")` output (node list + details)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters clause appearing in the plan's scans."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", physical_plan(df))


def has_pushed_term_filter(df: DataFrame, column: str = "term") -> bool:
    """True if some parquet scan prunes on ``column`` (In/EqualTo)."""
    return any(
        f"In({column}" in f or f"EqualTo({column}" in f for f in pushed_filters(df)
    )


def count_nodes(df: DataFrame, node: str) -> int:
    """Occurrences of a physical operator (e.g. 'Exchange',
    'BroadcastHashJoin', 'SortMergeJoin', 'CartesianProduct')."""
    return len(re.findall(rf"\b{re.escape(node)}\b", physical_plan(df)))


def count_shuffles(df: DataFrame) -> int:
    """Shuffle exchanges only (broadcast exchanges excluded)."""
    plan = physical_plan(df)
    return len(re.findall(r"\bExchange (?:hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)", plan))


def python_eval_nodes(df: DataFrame) -> list[str]:
    """Python evaluator operators present in the plan. Arrow-batched
    kernels show as ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas;
    row-at-a-time UDFs show as BatchEvalPython (never acceptable)."""
    plan = physical_plan(df)
    return re.findall(
        r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)\b", plan
    )


def assert_jvm_only(df: DataFrame) -> None:
    """Raise if ANY Python evaluator appears — for operators promised to
    run entirely inside whole-stage codegen."""
    nodes = python_eval_nodes(df)
    if nodes:
        raise AssertionError(f"expected a JVM-only plan, found {sorted(set(nodes))}")


def assert_no_rowwise_python(df: DataFrame) -> None:
    """Raise on row-at-a-time Python UDFs (BatchEvalPython); Arrow-batched
    kernels are allowed (input_hint: vectorized pandas/Arrow UDFs only)."""
    nodes = [n for n in python_eval_nodes(df) if n == "BatchEvalPython"]
    if nodes:
        raise AssertionError("row-at-a-time Python UDF (BatchEvalPython) in plan")
