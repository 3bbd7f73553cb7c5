"""Round-5 scale probe for the document-extraction stages
(operators/html.py, operators/pdf.py): both are zero-exchange
Arrow-batched passes in the scan stage, so wall time must track corpus
size ~linearly with no shuffle cliff — this probe pins that at 10x.

Usage: python tools/probe_extract_scale.py [sf_dir] [replicas]
Prints one JSON line per stage with 1x and Nx wall seconds.
"""

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, ".")
from data_engineering_etl_self_service_spark.catalog import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .appName("probe-extract-scale")
        .getOrCreate()
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    r = spark.range(replicas).withColumnRenamed("id", "r")
    blown = (
        docs.crossJoin(r)
        .select(
            (F.col("doc_id") * replicas + F.col("r")).alias("doc_id"),
            "text",
        )
        .repartition(32)
    )

    def run(df, stage):
        from data_engineering_etl_self_service_spark.operators.html import (
            build_html,
            extract_main_text,
        )
        from data_engineering_etl_self_service_spark.operators.pdf import (
            build_pdf,
            extract_pdf_text,
        )

        def html_pass(it):
            import pandas as pd

            for pdf in it:
                out = [
                    len(extract_main_text(build_html(t, int(i))))
                    for i, t in zip(pdf["doc_id"], pdf["text"])
                ]
                yield pd.DataFrame({"n": out})

        def pdf_pass(it):
            import pandas as pd

            for pdf in it:
                out = [
                    len(extract_pdf_text(build_pdf(t, int(i))))
                    for i, t in zip(pdf["doc_id"], pdf["text"])
                ]
                yield pd.DataFrame({"n": out})

        fn = html_pass if stage == "html" else pdf_pass
        t0 = time.time()
        n = df.mapInPandas(fn, "n long").agg(F.sum("n")).collect()[0][0]
        return time.time() - t0, n

    for stage in ("html", "pdf"):
        run(docs.limit(64), stage)  # warm-up: imports + Arrow spin-up
        w1, n1 = run(docs, stage)
        wN, nN = run(blown, stage)
        print(
            json.dumps(
                {
                    "probe": f"{stage}_extract_scale",
                    "docs_1x": docs.count(),
                    "docs_Nx": docs.count() * replicas,
                    "replicas": replicas,
                    "wall_1x_sec": round(w1, 2),
                    "wall_Nx_sec": round(wN, 2),
                    "chars_1x": n1,
                    "chars_Nx": nN,
                }
            )
        )
    spark.stop()


if __name__ == "__main__":
    main()
