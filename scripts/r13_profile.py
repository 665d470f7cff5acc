"""Round-13 optimization profiling harness (guide §1).

Usage:
  python scripts/r13_profile.py plans [name ...]   # dump explain("formatted")
  python scripts/r13_profile.py time <name> [reps] # noop-sink wall clock
  python scripts/r13_profile.py q42parts           # q42 stage isolation

Plans go to plans/r13/<name>_<tag>.txt (tag from $R13_TAG, default
"before"). Timing uses the noop sink (guide §1.4) and labels jobs
(§1.5); data dir from $SPARK_GRAFT_SF_DIR (default sf0.1)."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TAG = os.environ.get("R13_TAG", "before")
PLANS = os.path.join(REPO, "plans", "r13")


def get_spark():
    from anti_ddos_spark.session import get_spark as gs

    return gs(app_name="r13_profile")


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def dump_plans(names: list[str]) -> None:
    from anti_ddos_spark.queries import full_registry

    os.makedirs(PLANS, exist_ok=True)
    spark = get_spark()
    reg = full_registry()
    for name in names or list(reg):
        try:
            df = reg[name].fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {type(ex).__name__}: {ex}"
        out = os.path.join(PLANS, f"{name}_{TAG}.txt")
        with open(out, "w") as f:
            f.write(plan)
        print("wrote", out)


def time_query(name: str, reps: int = 3) -> None:
    from anti_ddos_spark.queries import full_registry

    spark = get_spark()
    reg = full_registry()
    fn = reg[name].fn
    walls = []
    for i in range(reps):
        spark.sparkContext.setJobDescription(f"{name} rep{i}")
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        build = time.perf_counter() - t0
        w = noop(df)
        walls.append(w)
        print(f"{name} rep{i}: build={build:.2f}s noop={w:.2f}s")
    print(f"{name}: min={min(walls):.2f}s walls={[round(w, 2) for w in walls]}")


def q42parts() -> None:
    from pyspark.sql import functions as F

    from anti_ddos_spark.operators.similarity import (
        as_double,
        hyperplane_signatures,
        norm,
    )
    from anti_ddos_spark.queries.base import t
    from anti_ddos_spark.queries.similarity import (
        NEARDUP_BANDS,
        NEARDUP_PLANES_PER_BAND,
    )

    spark = get_spark()
    emb = t(spark, SF_DIR, "embeddings")
    print("n_vectors:", emb.count())
    print("dim:", emb.select(F.size(as_double(F.col("embedding")))).head()[0])

    spark.sparkContext.setJobDescription("q42: signatures")
    t0 = time.perf_counter()
    sig = hyperplane_signatures(
        emb, NEARDUP_BANDS, NEARDUP_PLANES_PER_BAND, planes="data"
    )
    print(f"sig build+count plane check: {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    sig.write.format("noop").mode("overwrite").save()
    print(f"sig compute: {time.perf_counter() - t0:.2f}s")

    a, b = sig.alias("a"), sig.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )
    spark.sparkContext.setJobDescription("q42: candidates")
    t0 = time.perf_counter()
    n_cand = cand.count()
    print(f"candidates: {n_cand} rows in {time.perf_counter() - t0:.2f}s")

    embn = emb.select(
        F.col("vec_id"), as_double(F.col("embedding")).alias("e")
    ).withColumn("nrm", norm(F.col("e")))
    spark.sparkContext.setJobDescription("q42: norms")
    t0 = time.perf_counter()
    embn.write.format("noop").mode("overwrite").save()
    print(f"norms: {time.perf_counter() - t0:.2f}s")

    from anti_ddos_spark.queries.similarity import q42_cosine_neardup_pairs

    spark.sparkContext.setJobDescription("q42: full")
    for i in range(2):
        t0 = time.perf_counter()
        q42_cosine_neardup_pairs(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"q42 full rep{i}: {time.perf_counter() - t0:.2f}s")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "plans"
    if cmd == "plans":
        dump_plans(sys.argv[2:])
    elif cmd == "time":
        time_query(sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    elif cmd == "q42parts":
        q42parts()
    else:
        raise SystemExit(f"unknown command {cmd}")
