#!/usr/bin/env python
"""Headline benchmark. Prints ONE JSON line on stdout:

    {"metric": "bench_total_sec", "value": N, "unit": "sec",
     "queries": {name: sec, ...}, "sf": 0.1,
     "kg": {"docs": N, "triples": M, "triples_per_sec": X, ...}}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).

``--scaling`` re-runs the KG pipeline in two subprocesses at local[N] and
local[4N] on the same input (the sandbox stand-in for N vs 4N executors,
per BASELINE.md) and writes BENCH/BASELINE.md with throughput at both plus
scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
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
# (events_by_type was the 20th query through r5; it is retired from the
# contract registry in r6 — see docs/COVERAGE.md — and its scan-agg shape
# now lives on as BOTH the canary below and events_stats.)


def make_canary(spark, sf_dir):
    """The PHASE CANARY: a fixed, tiny, plan-stable scan-agg (events by
    type) timed immediately before every bench query. Its only job is to
    measure the BOX, not the engine: the plan never changes across
    rounds, so canary-time variation is machine phase (load, turbo,
    page cache), and per-query ``phase_factor`` = canary-at-that-moment
    / best-canary-this-run lets a reader mechanically classify a slow
    reading as slow-box vs slow-engine without cross-referencing
    invocation tables (round-5 verdict: three >2x readings needed
    hand-adjudication)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))

    def canary() -> float:
        t0 = time.time()
        force(ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")))
        return round(time.time() - t0, 4)

    canary()  # warm the plan once so samples measure execution only
    return canary


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def force(df):
    df.write.mode("overwrite").format("noop").save()


def timed_pipeline_split(q, spark, sf_dir) -> dict:
    """pipeline_e2e wall time split into driver-side plan compile vs
    execution. The cascade's lazy localCheckpoint barriers each trigger
    Catalyst + Janino whole-stage-codegen at CALL time (toRdd), so most
    compile cost lands inside q() construction — measured by timing the
    localCheckpoint calls themselves (pyspark.sql.classic.dataframe is
    the class instances actually use in Spark 4, not the pyspark.sql
    facade) plus the final segment's toRdd. exec_sec is everything else:
    the checkpointed stages' materialization + final-segment run — the
    number that scales with data (the 100 TB-relevant path); compile_sec
    is a per-JOB constant that amortizes to zero at real scale."""
    import pyspark.sql.classic.dataframe as cdf

    compile_acc = [0.0]
    orig = cdf.DataFrame.localCheckpoint

    def timed(self, *args, **kwargs):
        # signature-transparent forward: Spark 4's localCheckpoint also
        # takes an optional storageLevel — a positional wrapper would
        # TypeError on callers passing it while the patch is active
        t = time.time()
        out = orig(self, *args, **kwargs)
        compile_acc[0] += time.time() - t
        return out

    cdf.DataFrame.localCheckpoint = timed
    try:
        t0 = time.time()
        df = q(spark, sf_dir)
        t_rdd = time.time()
        df._jdf.queryExecution().toRdd()
        t1 = time.time()
        force(df)
        t2 = time.time()
    finally:
        cdf.DataFrame.localCheckpoint = orig
    total = round(t2 - t0, 3)
    compile_sec = round(compile_acc[0] + (t1 - t_rdd), 3)
    return {
        "total_sec": total,
        "compile_sec": compile_sec,
        "exec_sec": round(total - compile_sec, 3),
    }


def timed_pipeline_durable(spark, sf_dir) -> dict:
    """pipeline_e2e with a durable StageMaterializer over a throwaway
    root: every barrier becomes a written parquet stage + ledger entry —
    the fault-tolerant 100 TB execution shape, timed so the durability
    premium over the lazy-checkpoint path is a measured number, not
    prose. ``stages_sec`` is the ledger's summed per-stage durations
    (compute + parquet write, driver-observed); ``final_sec`` the
    post-stages final-segment run; ``total_sec`` wall for the whole
    materialized pipeline including driver-side planning."""
    import shutil
    import tempfile

    import __spark_entry__ as entry
    from smartlogic_concordance_transformer_spark.datapipe.curation import (
        pretraining_pipeline,
    )
    from smartlogic_concordance_transformer_spark.io_tables import StageMaterializer

    root = tempfile.mkdtemp(prefix="bench_stages_")
    try:
        mat = StageMaterializer(spark, root, fingerprint="bench-r6")
        raw, bench_df = entry._pipeline_raw(spark, sf_dir)
        t0 = time.time()
        out = pretraining_pipeline(
            raw, bench_df, mix_fractions={"src0": 64, "src1": 128}, materialize=mat
        )
        t_built = time.time()
        force(out.select("doc_id", "kept", "stage", "split"))
        t1 = time.time()
        return {
            "total_sec": round(t1 - t0, 3),
            "stages_sec": round(
                sum(e["duration_sec"] for e in mat.ledger.entries()), 3
            ),
            "final_sec": round(t1 - t_built, 3),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def kg_scale_run(spark, n_docs: int, reps: int = 3) -> dict:
    """Generated-scale KG pipeline: source -> transform -> triples.

    The throughput metric (triples/sec) for the scaling-efficiency story.
    Protocol: one warm-up pass at 1% (JIT + Python worker pool spin-up),
    then best-of-``reps`` timed actions over the full input — the whole
    pipeline is a single narrow stage, so ``count()`` executes parse +
    validate + derive + assemble + explode in one pass with no shuffle.
    Best-of-N because single-JVM local mode has +-30% GC/turbo noise.
    """
    import tempfile

    from smartlogic_concordance_transformer_spark.gen import generate_source_repos
    from smartlogic_concordance_transformer_spark.transform import transform
    from smartlogic_concordance_transformer_spark.triples import emit_triples

    cpus = spark.sparkContext.defaultParallelism
    warm = generate_source_repos(spark, max(1000, n_docs // 100), seed=1, partitions=cpus)
    emit_triples(transform(warm)[0]).count()

    # Materialize the source once (untimed): the timed job is scan ->
    # transform -> triples, which is what the engine actually does in
    # production — generation is not part of the measured pipeline.
    src_path = os.path.join(tempfile.gettempdir(), f"bench_src_{n_docs}")
    if not os.path.exists(os.path.join(src_path, "_SUCCESS")):
        generate_source_repos(spark, n_docs, seed=42, partitions=128).write.mode(
            "overwrite"
        ).parquet(src_path)
    src = spark.read.parquet(src_path)
    good, quar = transform(src)
    triples = emit_triples(good)
    runs = []
    n_triples = 0
    for _ in range(reps):
        t0 = time.time()
        n_triples = triples.count()
        runs.append(round(time.time() - t0, 3))
    wall = min(runs)
    n_quar = quar.count()  # untimed: lineage stat, second pass by design
    return {
        "docs": n_docs,
        "triples": n_triples,
        "quarantined": n_quar,
        "wall_sec": wall,
        "runs_sec": runs,
        "triples_per_sec": round(n_triples / wall, 1),
        "docs_per_sec": round(n_docs / wall, 1),
    }


def main() -> dict:
    load0 = os.getloadavg()  # ambient load BEFORE the bench adds its own
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if not os.path.isdir(sf_dir):
        log(f"error: SPARK_GRAFT_SF_DIR={sf_dir} does not exist")
        sys.exit(2)
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = 0.0

    from smartlogic_concordance_transformer_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench-{cpus}", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    # Warm-up (untimed): spin up the Python worker pool, compile the
    # codegen'd UUID/validation kernels, and touch the parquet dir once so
    # the first timed query measures the query, not JVM/worker startup.
    from smartlogic_concordance_transformer_spark.gen import generate_source_repos
    from smartlogic_concordance_transformer_spark.transform import transform
    from smartlogic_concordance_transformer_spark.triples import emit_triples

    emit_triples(transform(generate_source_repos(spark, 2000, seed=1))[0]).count()
    spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).count()

    qs = entry.queries()
    per_query: dict[str, float] = {}
    canary = make_canary(spark, sf_dir)
    canary_samples: dict[str, float] = {"_start": canary()}
    t_total0 = time.time()

    # headline KG throughput FIRST: it is the metric the scaling story
    # rides on, so it gets the freshest box state (the 17-query loop
    # below heats the box for a minute+ and load decays slowly)
    n_docs = int(os.environ.get("SPARK_GRAFT_KG_DOCS", "0")) or max(20000, int(sf * 6_000_000))
    kg = kg_scale_run(spark, n_docs)
    log(f"  kg_scale({n_docs} docs): {kg['wall_sec']}s -> {kg['triples_per_sec']} triples/s")

    pipeline_split = None
    for name in BENCH_QUERIES:
        canary_samples[name] = canary()
        if name == "pipeline_e2e":
            pipeline_split = timed_pipeline_split(qs[name], spark, sf_dir)
            per_query[name] = pipeline_split["total_sec"]
            log(
                f"  {name}: {per_query[name]}s (compile "
                f"{pipeline_split['compile_sec']}s / exec "
                f"{pipeline_split['exec_sec']}s)"
            )
            continue
        t0 = time.time()
        force(qs[name](spark, sf_dir))
        per_query[name] = round(time.time() - t0, 3)
        log(f"  {name}: {per_query[name]}s")
    canary_samples["_end"] = canary()
    # bench_total_sec must stay comparable with rounds 1-5 (kg run +
    # query loop, nothing else): stamp it HERE — before the durable
    # pipeline run — and net out the interleaved canary executions,
    # which are box instrumentation, not engine work. Both overheads are
    # reported as their own fields instead.
    canary_overhead = round(
        sum(v for k, v in canary_samples.items() if k != "_start"), 3
    )
    total = round(time.time() - t_total0 - canary_overhead, 3)

    # the durable-barrier pipeline (StageMaterializer): at 100 TB this IS
    # the execution shape — every barrier a persisted stage table — so it
    # gets its own timed row next to the lazy-checkpoint split
    pipeline_durable = timed_pipeline_durable(spark, sf_dir)
    log(
        f"  pipeline_e2e_durable: {pipeline_durable['total_sec']}s (stage "
        f"writes {pipeline_durable['stages_sec']}s / final "
        f"{pipeline_durable['final_sec']}s)"
    )

    ref = min(canary_samples.values())
    phase_factor = {
        n: round(canary_samples[n] / ref, 2) for n in BENCH_QUERIES
    }
    result = {
        "metric": "bench_total_sec",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "canary_overhead_sec": canary_overhead,
        "pipeline_e2e_split": pipeline_split,
        "pipeline_e2e_durable": pipeline_durable,
        # phase canary (see make_canary): phase_factor[q] ~ 1.0 means the
        # box at query q's start ran the fixed canary plan at this run's
        # best speed; >> 1 means q's reading is inflated by box phase —
        # a >2x vs-baseline reading with phase_factor ~1 is an engine
        # regression, with phase_factor >~ its overshoot it is box noise
        "canary": {
            "query": "events groupBy(event_type) count",
            "ref_sec": ref,
            "samples": canary_samples,
        },
        "phase_factor": phase_factor,
        "sf": sf,
        "cpus": cpus,
        "kg": kg,
        # box-phase evidence: this box has noisy phases with up to 3x
        # spread on identical plans (BENCH/BASELINE.md). "load" is the
        # load average sampled when THIS process started (an exit sample
        # would only measure the bench itself). Caveat: in --scaling runs
        # every pass after the first starts with the preceding pass's load
        # still decaying, so only the first pass's sample is truly
        # ambient — later samples honestly record that contamination.
        "load": dict(zip(("1m", "5m", "15m"), (round(x, 2) for x in load0))),
    }
    spark.stop()
    return result


_MP_PAYLOAD: list = []


def _mp_ceiling(src_path: str, n_docs_cap: int = 800_000) -> str:
    """The box's scaling ceiling for THIS workload: the engine's actual
    Arrow-batch fold kernel (``pyfold.convert_udf``) over the actual
    bench payloads, driven by plain multiprocessing — no Spark, no Arrow
    IPC, fork-COW input. This replaces round-4's toy json+md5 loop,
    whose tiny cache-resident working set scaled 8->32 at ~0.9 and
    OVERSTATED what any Arrow-UDF engine could reach: the real fold is
    allocation/memory-bandwidth heavy and measures ~0.6 on this box —
    the honest bound a zero-overhead engine could hit (each executor on
    a real 4N-node cluster brings its own memory bus, so the bound does
    not transfer to cluster scaling)."""
    import multiprocessing as mp

    import pyarrow.parquet as pq

    global _MP_PAYLOAD
    _MP_PAYLOAD = (
        pq.read_table(src_path, columns=["content"])
        .column("content")
        .to_pylist()[:n_docs_cap]
    )
    n = len(_MP_PAYLOAD)
    tputs = {}
    for procs in (32, 8, 2):
        chunks = [(i * n // procs, (i + 1) * n // procs) for i in range(procs)]
        with mp.Pool(procs) as p:
            t0 = time.time()
            done = sum(p.map(_mp_kernel, chunks))
            tputs[procs] = done / (time.time() - t0)
    _MP_PAYLOAD = []
    e28 = tputs[8] / (4 * tputs[2])
    e832 = tputs[32] / (4 * tputs[8])
    return (
        f"real fold kernel over {n} bench payloads: 2 procs "
        f"{tputs[2]:.0f} docs/s, 8 procs {tputs[8]:.0f}/s, 32 procs "
        f"{tputs[32]:.0f}/s -> ceiling efficiency 2->8 = {e28:.2f}, "
        f"8->32 = {e832:.2f}."
    )


def _mp_kernel(args: tuple) -> int:
    """One pool worker: run the engine's real per-batch fold over a slice
    of the payload list (inherited via fork COW), at the same 10k-row
    Arrow batch grain the Spark job uses."""
    import pandas as pd

    from smartlogic_concordance_transformer_spark.pyfold import convert_udf

    fn = convert_udf.func
    lo, hi = args
    s = pd.Series(_MP_PAYLOAD[lo:hi])
    total = 0
    for i in range(0, len(s), 10000):
        total += len(fn(s.iloc[i : i + 10000]))
    return total


def scaling(n_small: int = 2, n_docs: int = 2_400_000) -> None:
    """Run the KG job at local[N], local[4N], and local[32]; write
    BENCH/BASELINE.md.

    N=2 vs 4N=8 is the honest N->4N pair on this box: both points sit
    below the single-JVM memory-bandwidth ceiling, which is what a real
    cluster's per-executor environment looks like (each executor brings
    its own memory bus). local[32] is reported as the absolute-throughput
    point and shows the single-box saturation explicitly.
    """
    # Two full passes over the level sequence, keep the better throughput
    # per level: per-level best-of-3 controls within-process noise, the
    # second pass controls thermal/turbo drift BETWEEN levels. Per-PASS
    # ratios are also reported: the 4N and N legs of one pass run
    # back-to-back (phase-adjacent), so their ratio is robust against the
    # box drifting BETWEEN levels — best-per-level ratios can mix a
    # fast-phase denominator with a slow-phase numerator (measured round
    # 6: best-per-level 0.72 while every phase-matched adjacent pair read
    # 0.77-0.85 on the same code).
    results = {}
    passes: dict[int, dict[int, dict]] = {1: {}, 2: {}}
    for pass_no in (1, 2):
        for cpus in (32, n_small * 4, n_small):  # large first each pass
            env = dict(
                os.environ,
                SPARK_GRAFT_CPUS=str(cpus),
                SPARK_GRAFT_KG_DOCS=str(n_docs),
            )
            log(f"=== scaling pass {pass_no} local[{cpus}] ===")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            # emit() keeps stdout short; the subprocess just wrote the
            # full result (canary samples, pipeline splits, load) to the
            # detail side file — fold it back in for BASELINE.md regen
            dp = os.path.join(REPO, "BENCH", "bench_detail.json")
            try:
                with open(dp) as df_:
                    r = {**json.load(df_), **r}
            except (OSError, ValueError):
                pass
            passes[pass_no][cpus] = r
            prev = results.get(cpus)
            if prev is None or r["kg"]["triples_per_sec"] > prev["kg"]["triples_per_sec"]:
                results[cpus] = r

    small, large, full = results[n_small], results[n_small * 4], results[32]
    tput_s = small["kg"]["triples_per_sec"]
    tput_l = large["kg"]["triples_per_sec"]
    tput_f = full["kg"]["triples_per_sec"]
    eff = tput_l / (4 * tput_s)
    eff_8_32 = tput_f / (4 * tput_l)
    pass_effs = {
        p: passes[p][n_small * 4]["kg"]["triples_per_sec"]
        / (4 * passes[p][n_small]["kg"]["triples_per_sec"])
        for p in passes
    }
    import tempfile

    ceiling = _mp_ceiling(os.path.join(tempfile.gettempdir(), f"bench_src_{n_docs}"))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    md = f"""# BENCH baseline — scaling efficiency N -> 4N

Protocol (BASELINE.md): same KG job (parquet scan -> parse -> validate ->
derive -> assemble -> triples; generation is materialized untimed), same
deterministic input ({n_docs} docs, seed 42), best-of-3 timed runs after
warm-up, three parallelism levels as the sandbox stand-in for N vs 4N
executors, largest level first (thermal-drift control).

| parallelism | wall best (s) | all runs (s) | triples/sec | docs/sec |
|---|---|---|---|---|
| local[{n_small}] (N) | {small['kg']['wall_sec']} | {small['kg']['runs_sec']} | {tput_s} | {small['kg']['docs_per_sec']} |
| local[{n_small * 4}] (4N) | {large['kg']['wall_sec']} | {large['kg']['runs_sec']} | {tput_l} | {large['kg']['docs_per_sec']} |
| local[32] | {full['kg']['wall_sec']} | {full['kg']['runs_sec']} | {tput_f} | {full['kg']['docs_per_sec']} |

**Scaling efficiency {n_small}->{n_small * 4}** = throughput_4N / (4 x
throughput_N) = **{eff:.3f}** best-per-level; **{n_small * 4}->32** =
**{eff_8_32:.3f}** (target >= 0.8 per BASELINE.json).

Phase-matched per-pass {n_small}->{n_small * 4} ratios (the 4N and N legs
of one pass run back-to-back, so each ratio compares phase-adjacent
measurements — best-per-level can mix a fast-phase denominator with a
slow-phase numerator on this phase-swinging box): pass 1 =
**{pass_effs[1]:.3f}**, pass 2 = **{pass_effs[2]:.3f}**.

Hardware-ceiling context (measured, same box, plain multiprocessing of
the ENGINE'S OWN Arrow-batch fold kernel over the actual bench payloads
— no Spark, no Arrow IPC, fork-COW input):
{ceiling}
i.e. even a perfect zero-overhead implementation cannot exceed those
ratios here: a single shared box lowers per-core turbo clocks and
saturates one memory bus as occupancy rises, whereas each executor on a
real 4N-node cluster brings its own bus and clocks. (Rounds 1-4 used a
toy json+md5 loop as the probe; its cache-resident working set scaled
8->32 at ~0.9 and overstated the reachable bound — the real
allocation-heavy kernel measures ~0.6, see the round-5 profile note
below the marker.) The engine's plan is a single narrow stage (zero
shuffles — see tests/test_plan_shape.py), so cluster scaling is bounded
only by the source scan.

Per-query seconds at local[32], sf={full['sf']} (phase_factor: the fixed
canary plan's time at that query's start relative to this run's best
canary — ~1.0 means the box was at full speed, >>1 means the reading is
inflated by box phase, mechanically separating slow-box from slow-engine):

| query | sec | phase_factor |
|---|---|---|
""" + "\n".join(
        f"| {k} | {v} | {full.get('phase_factor', {}).get(k, '')} |"
        for k, v in full["queries"].items()
    ) + "\n"
    split = full.get("pipeline_e2e_split")
    if split:
        md += (
            f"\npipeline_e2e split: compile {split['compile_sec']}s / exec "
            f"{split['exec_sec']}s — the one-time driver-side plan compile "
            "amortizes to zero at real scale; exec is the data-dependent "
            "path.\n"
        )
    dur = full.get("pipeline_e2e_durable")
    if dur:
        md += (
            f"\npipeline_e2e durable-barrier run (StageMaterializer, every "
            f"barrier a persisted parquet stage + ledger entry — the "
            f"fault-tolerant 100 TB shape): total {dur['total_sec']}s = stage "
            f"compute+write {dur['stages_sec']}s + final segment "
            f"{dur['final_sec']}s.\n"
        )
    # hand-maintained narrative sections (round notes, kernel
    # micro-benchmarks) live below an explicit marker — carry everything
    # from the marker onward across regenerations
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    marker = "<!-- HAND-MAINTAINED:"
    if os.path.exists(path):
        old = open(path).read()
        if marker in old:
            md += "\n" + old[old.index(marker):]
    with open(path, "w") as f:
        f.write(md)
    log(f"wrote BENCH/BASELINE.md, efficiency={eff:.3f}")
    print(json.dumps({"metric": "scaling_efficiency", "value": round(eff, 3), "unit": "ratio",
                      "phase_matched_pass_effs": {p: round(v, 3) for p, v in pass_effs.items()},
                      "queries": {f"local[{n_small}]": small["kg"]["wall_sec"],
                                  f"local[{n_small * 4}]": large["kg"]["wall_sec"],
                                  "local[32]": full["kg"]["wall_sec"]},
                      "sf": large["sf"]}))


def emit(result: dict) -> str:
    """One SHORT machine-readable line on stdout; bulk to a side file.

    Round 6's single result line grew past the driver's tail-capture
    window (BENCH_r06.json came back ``"parsed": null`` with the line
    starting mid-number), so the flagship observability fields broke the
    machine channel they report through. The headline keeps every field
    the driver and the scaling harness consume — metric/value/queries,
    per-query phase_factor, kg throughput, sf/cpus — compact-separated
    (~1.2 KB for 20 queries); canary samples, pipeline splits, and load
    go to BENCH/bench_detail.json.
    """
    detail_path = os.path.join(REPO, "BENCH", "bench_detail.json")
    os.makedirs(os.path.dirname(detail_path), exist_ok=True)
    with open(detail_path, "w") as f:
        json.dump(result, f, indent=1)
    headline = {
        k: result[k]
        for k in ("metric", "value", "unit", "queries", "phase_factor",
                  "sf", "cpus", "kg")
        if k in result
    }
    headline["detail"] = "BENCH/bench_detail.json"
    return json.dumps(headline, separators=(",", ":"))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        print(emit(main()))
