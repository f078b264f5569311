"""Dump .explain('formatted') for named declared queries.

Usage:
    python tools/dump_plans.py <suffix> <outdir> <query> [query ...]

Writes <outdir>/<query>_<suffix>.txt. Run from the repo whose plans you
want (sys.path[0] decides which __spark_entry__ is imported), pointing
outdir at the canonical plans/r06 directory.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix, outdir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    import __spark_entry__ as entrymod
    from careers_spark.session import get_spark

    spark = get_spark(
        "dump_plans",
        cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entrymod.queries()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001 - report, keep dumping
            txt = f"PLAN DUMP FAILED: {ex!r}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(name, "ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
