"""Capture .explain("formatted") for declared queries into plans/r12/.

Usage:
    python scripts/r12_capture_plans.py [suffix] [name ...]

Writes plans/r12/<query>_<suffix>.txt (suffix defaults to "before").
With no names, captures every query in the registry.  Streaming
queries execute their drain when constructed, so building the final
batch frame is the honest plan for the batch read they return.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from nifi_datasynthesizer_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r12")


def main() -> None:
    args = sys.argv[1:]
    suffix = args[0] if args else "before"
    names = args[1:]
    spark = get_spark(app="r12-plans")
    spark.sparkContext.setLogLevel("ERROR")
    q = entrymod.queries()
    targets = names or list(q)
    os.makedirs(OUT, exist_ok=True)
    for name in targets:
        try:
            df = q[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR capturing plan: {e!r}"
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else "ERROR")
    spark.stop()


if __name__ == "__main__":
    main()
