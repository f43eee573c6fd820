#!/usr/bin/env python
"""Round-8 optimization instrumentation (bench.py itself is FROZEN).

Per bench query: split wall time into driver-side plan work (query
construction + Catalyst analysis/optimization/physical planning +
codegen, measured via toRdd) vs execution (noop-sink force of the
pre-compiled plan), median over N runs. Also dumps
``.explain("formatted")`` per query to plans/r08/.

Usage:
    python bench_extra.py                 # all bench queries
    python bench_extra.py q1 q2 ...       # subset
    python bench_extra.py --plans-only    # just write the explain files
    python bench_extra.py --suffix after  # write *_after.txt plans

Prints one JSON line: {"queries": {name: {"compile": s, "exec": s,
"total": s, "samples": [...]}}}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_QUERIES = [
    "kg_upp_json",
    "kg_triples",
    "kg_cc",
    "dedup_exact",
    "dedup_minhash",
    "dedup_jaccard",
    "dedup_lsh_verified",
    "dedup_embed",
    "dedup_simhash",
    "sim_topk",
    "sim_ivf",
    "graph_motifs",
    "text_quality",
    "text_langid",
    "text_repetition",
    "text_decontaminate",
    "pipeline_e2e",
    "agg_pricing",
    "join_top_customers",
    "events_stats",
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def force(df):
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    argv = sys.argv[1:]
    skip = set()
    for flag in ("--suffix", "--reps"):
        if flag in argv:
            skip.add(argv.index(flag) + 1)
    args = [a for i, a in enumerate(argv) if not a.startswith("--") and i not in skip]
    plans_only = "--plans-only" in sys.argv
    suffix = "before"
    if "--suffix" in sys.argv:
        suffix = sys.argv[sys.argv.index("--suffix") + 1]
    reps = 3
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
    names = args or BENCH_QUERIES

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from smartlogic_concordance_transformer_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-extra-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    # same warm-up as bench.py
    from smartlogic_concordance_transformer_spark.gen import generate_source_repos
    from smartlogic_concordance_transformer_spark.transform import transform
    from smartlogic_concordance_transformer_spark.triples import emit_triples

    emit_triples(transform(generate_source_repos(spark, 2000, seed=1))[0]).count()
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()

    qs = entry.queries()
    plans_dir = os.path.join(REPO, "plans", "r08")
    os.makedirs(plans_dir, exist_ok=True)

    out: dict[str, dict] = {}
    for name in names:
        q = qs[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        # one warm pass builds the plan for the explain dump
        df = q(spark, sf_dir)
        with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        if plans_only:
            log(f"  {name}: plan written")
            continue
        samples = []
        for _ in range(reps):
            t0 = time.time()
            df = q(spark, sf_dir)
            df._jdf.queryExecution().toRdd()
            t1 = time.time()
            force(df)
            t2 = time.time()
            samples.append((round(t1 - t0, 3), round(t2 - t1, 3)))
        comp = statistics.median(s[0] for s in samples)
        exe = statistics.median(s[1] for s in samples)
        out[name] = {
            "compile": round(comp, 3),
            "exec": round(exe, 3),
            "total": round(comp + exe, 3),
            "samples": samples,
        }
        log(f"  {name}: compile {comp:.2f}s exec {exe:.2f}s")
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
