"""Profile the OTLP metrics parser's subtree duplication (q94/q116).

Counts scan/from_json occurrences in the physical plan and times the
declared queries with the noop sink (guide §1.4).
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from greptimedb_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main():
    spark = get_spark()
    qs = entry.queries()
    for name in ("q94_otlp_ingest", "q116_otlp_histogram"):
        df = qs[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        n_scan = len(re.findall(r"Scan parquet", plan))
        n_json = plan.count("from_json")
        n_exch = len(re.findall(r"\bExchange\b", plan))
        print(f"{name}: scans={n_scan} from_json={n_json} exchanges={n_exch}")
        reps = []
        for _ in range(4):
            spark.sparkContext.setJobDescription(f"profile {name}")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            reps.append(round(time.time() - t0, 3))
        print(f"{name}: noop reps {reps}")
        with open(f"/tmp/{name}_plan.txt", "w") as f:
            f.write(plan)
    spark.stop()


if __name__ == "__main__":
    main()
