"""Formatted-plan accessors for tests and tuning.

The reference defeats Catalyst across stages by dropping to RDDs between
DataFrame segments (``SparkRunner.scala:77,110`` — SURVEY §4); the
rebuild's single-plan design makes these properties checkable: a filter
that should reach the parquet scan shows up in ``PushedFilters``, a
pruned projection in ``ReadSchema``, a broadcast join as
``BroadcastHashJoin``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line.removeprefix("PushedFilters:").strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    return [
        line.strip().removeprefix("ReadSchema:").strip()
        for line in formatted_plan(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def has_operator(df: DataFrame, op: str) -> bool:
    return op in formatted_plan(df)


def count_operator(df: DataFrame, op: str) -> int:
    """Count physical operators by their detail header ``(N) Op`` — the
    formatted output shows each operator twice (tree + detail)."""
    import re

    return len(re.findall(rf"^\(\d+\) {re.escape(op)}\b", formatted_plan(df), re.M))


def count_distinct_operator(df: DataFrame, op: str) -> int:
    """Count DISTINCT physical operator instances (by plan node id).
    Robust to AQE printing the same plan more than once."""
    import re

    return len(
        set(re.findall(rf"^\((\d+)\) {re.escape(op)}\b", formatted_plan(df), re.M))
    )


def tree_nodes(plan: str) -> list[tuple[int, str, int]]:
    """Parse the formatted-explain tree section into
    ``(depth, operator_name, node_id)`` rows in print order (root
    first). Depth comes from the 3-char-per-level indentation; the
    branch glyphs (``+-``, ``:-``, ``:``) are part of the prefix. A
    whole-stage-codegen marker (``+- * HashAggregate (2)``) is consumed
    separately so it neither hides the node nor distorts its depth
    (ADVICE r6: the old prefix class excluded ``*``, silently skipping
    codegen-annotated lines on non-AQE / final adaptive plans)."""
    import re

    lines = plan.splitlines()
    try:
        i = next(
            j for j, l in enumerate(lines) if l.startswith("== Physical Plan ==")
        )
    except StopIteration:
        return []
    nodes = []
    for line in lines[i + 1 :]:
        if not line.strip():
            break
        m = re.match(r"^([\s:+|-]*?)(?:\*\s*)?([A-Za-z][^(]*)\((\d+)\)\s*$", line)
        if not m:
            continue
        prefix, name, nid = m.groups()
        nodes.append((len(prefix) // 3, name.strip().split()[0], int(nid)))
    return nodes


def operator_has_descendant(plan: str, parent_op: str, child_op: str) -> bool:
    """True if any ``parent_op`` node has a ``child_op`` node anywhere in
    its INPUT subtree (ancestry from the tree indentation — sibling
    subtrees of a join do NOT count, unlike a whole-plan substring
    check)."""
    nodes = tree_nodes(plan)
    for idx, (depth, op, _) in enumerate(nodes):
        if op != parent_op:
            continue
        for d2, op2, _ in nodes[idx + 1 :]:
            if d2 <= depth:
                break
            if op2 == child_op:
                return True
    return False


def global_window_findings(plan: str) -> list[str]:
    """Scan the formatted plan's DETAIL section for window operators
    whose partitioning would put the whole input on ONE task at scale:

    - a ``Window``/``WindowInPandas``/``WindowGroupLimit`` whose
      Arguments carry no partition bracket (Spark prints ``[funcs],
      [order]`` — two groups — when ``partitionBy`` was omitted), and
    - a partition key that is the self-subtraction constant trick
      (``partitionBy(c - c)``): Catalyst projects the expression into a
      ``_wN`` attribute below the window, so the window itself looks
      partitioned — the lint chases the attribute to its defining
      ``(x#i - x#i) AS _wN#j`` projection.

    Returns human-readable findings (empty = no global windows). Both
    shapes are legitimate ONLY when the window input is bounded by
    construction (calendar buckets, |groups|x|bins| tables) — callers
    keep an explicit allowlist naming each query's bound.
    """
    import re

    findings = []
    # constant partition attrs: self-subtraction (c - c) or a bare
    # literal projected into the window's internal _wN attribute
    const_attrs = {
        m.group(2)
        for m in re.finditer(r"\((\S+#\d+L?) - \1\) AS (_w\d+#\d+L?)", plan)
    } | {
        m.group(1)
        for m in re.finditer(r"\b\d+(?:\.\d+)? AS (_w\d+#\d+L?)", plan)
    }
    for m in re.finditer(
        r"^\(\d+\) (Window|WindowInPandas|WindowGroupLimit)\s*$"
        r"((?:\n(?!\(\d+\)).*)*)",
        plan,
        re.M,
    ):
        op, body = m.group(1), m.group(2)
        am = re.search(r"^Arguments: (.*)$", body, re.M)
        if not am:
            continue
        groups = re.findall(r"\[[^\[\]]*\]", am.group(1))
        if op == "WindowGroupLimit":
            part = groups[0] if groups else "[]"
        elif len(groups) >= 3:
            # Window/WindowInPandas: [funcs], [partition], [order]
            part = groups[1]
        elif len(groups) == 2:
            # two groups is ambiguous: [funcs], [order] (no partition)
            # vs [funcs], [partition] (unordered whole-partition frame)
            # — order specs always carry a sort direction
            second = groups[1]
            part = "[]" if re.search(r"\b(ASC|DESC)\b", second) else second
        else:
            part = "[]"
        if part == "[]" or not re.search(r"#\d+", part):
            findings.append(f"{op} with no partition key: {am.group(1)[:120]}")
            continue
        attrs = re.findall(r"_w\d+#\d+L?", part)
        if attrs and all(a in const_attrs for a in attrs):
            findings.append(
                f"{op} partitioned only by constant self-subtraction "
                f"({part[:80]})"
            )
    return findings
