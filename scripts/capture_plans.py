#!/usr/bin/env python
"""Capture .explain('formatted') for every registered query into
plans/<round>/<query>_<tag>.txt (tag = before/after, argv[1];
round dir from $SPARK_GRAFT_PLANS_ROUND, default r14).

Fixture-building queries (stats_catalog_parity, era_mixed_time_range,
advised_join_parity) execute eagerly inside the builder and return a
local frame — their interesting plans are internal; the captured plan
documents the returned frame plus a header noting that.

Usage: python scripts/capture_plans.py before [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from data_pipeline_project_spark.plans.registry import get_queries  # noqa: E402
from data_pipeline_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = REPO / "plans" / os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
    out_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark(app_name="capture_plans")
    queries = get_queries()
    for name in sorted(queries):
        if only and name not in only:
            continue
        try:
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — record, keep going
            text = f"ERROR building/explaining: {type(exc).__name__}: {exc}\n"
        (out_dir / f"{name}_{tag}.txt").write_text(text)
        print(f"wrote {name}_{tag}.txt ({len(text)} bytes)", flush=True)


if __name__ == "__main__":
    main()
