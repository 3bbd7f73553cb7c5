"""Dump `.explain("formatted")` output for named headline queries.

Used for the committed before/after plan evidence under plans/r<N>/:

    python tools/dump_plans.py plans/r12 before dup_span_extents trigram_rarity ...
    python tools/dump_plans.py plans/r12 after  dup_span_extents ...

Writes plans/r12/<query>_<tag>.txt with the formatted physical plan of
the UNEXECUTED DataFrame (pre-AQE), using the PLAN_VIEWS twin where the
query's materializing form would otherwise explain as an opaque
ExistingRDD scan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_etl_self_service_spark import get_spark
from data_engineering_etl_self_service_spark.queries import PLAN_VIEWS, QUERIES


def main() -> None:
    out_dir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-plans")
    jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = PLAN_VIEWS.get(name, QUERIES[name])(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(jvm_mode)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {name} ({tag}) at {sf_dir}\n")
            fh.write(txt)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
