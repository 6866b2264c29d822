"""Capture `.explain("formatted")` for named bench queries into
plans/r16/<query>_<suffix>.txt — the judge-facing before/after plan
evidence for the optimization rounds.

Run from the tree whose plans you want (a pristine worktree for
"before", the working tree for "after"); the output always lands in the
MAIN repo's plans/ dir so both halves sit side by side.

Usage: python tools/capture_plans.py <suffix> <query> [query ...]
       [--sf-dir DIR] [--out-dir DIR]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from datamunging_spark import get_spark  # noqa: E402

OUT_DEFAULT = "/root/repo/plans/r16"


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    opts = dict(
        a.split("=", 1) for a in sys.argv[1:] if a.startswith("--")
    )
    suffix, names = args[0], args[1:]
    sf_dir = opts.get("--sf-dir", "/root/testdata/sf0.01")
    out_dir = opts.get("--out-dir", OUT_DEFAULT)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = getattr(entrymod, f"q_{name}")
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
