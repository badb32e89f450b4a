"""Dump .explain("formatted") for named queries to plans/<outdir>/<name>_<tag>.txt."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    tag = "before"
    outdir = "plans/r16"
    sf_dir = "/root/testdata/sf0.1"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--tag":
            tag = args[i + 1]; i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--outdir":
            outdir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    from qb_data_pipeline_backfill_spark import plans
    from qb_data_pipeline_backfill_spark.session import get_spark

    spark = get_spark("dump-plans")
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), outdir)
    os.makedirs(root, exist_ok=True)
    for name in names:
        df = plans.REGISTRY[name].spark(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(root, f"{name}_{tag}.txt"), "w") as f:
            f.write(txt)
        print(f"{name}: {len(txt)} chars -> {name}_{tag}.txt", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
