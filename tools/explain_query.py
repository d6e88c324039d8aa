"""Plan inspector for registry queries — the `.explain("formatted")`
loop the engine's own development runs, packaged for operators and
reviewers:

    python tools/explain_query.py <query_name> [sf_dir]
    python tools/explain_query.py --list

Prints the formatted physical plan plus a one-line audit: whole-stage
codegen span count, exchange (shuffle) count, broadcast count, and
loud flags for CartesianProduct / row-wise Python stages (the two
anti-patterns tests/test_plan_quality.py bans registry-wide).
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    from kafka_connect_bigquery_spark import queries as qmod

    registry = qmod.queries()
    if not argv or argv[0] == "--list":
        print("\n".join(registry))
        return 0
    name = argv[0]
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"
    if name not in registry:
        print(f"unknown query {name!r}; --list shows all", file=sys.stderr)
        return 2

    from kafka_connect_bigquery_spark.session import get_spark

    spark = get_spark("explain")
    df = registry[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    print(plan)
    audit = {
        # formatted mode tags operators with "(codegen id : N)"; count
        # distinct span ids, not occurrences
        "whole_stage_codegen_spans": len(
            set(re.findall(r"codegen id : (\d+)", plan))
        ),
        "exchanges": plan.count("Exchange"),
        "broadcasts": plan.count("BroadcastExchange"),
        "cartesian_product": "CartesianProduct" in plan,
        "rowwise_python": "BatchEvalPython" in plan,
        "arrow_python": "ArrowEvalPython" in plan or "MapInPandas" in plan,
    }
    print("AUDIT:", audit)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
