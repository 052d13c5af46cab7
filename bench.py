"""Benchmark harness — run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
JSON: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. The FINAL stdout line is a compact
(<2000-char) summary sized to the driver's tail window; the line before
it and bench_results.json carry the full per-query map.

Each query is timed as median-of-3 full executions after a per-query
warm-up; timing is wall-clock around the terminal action (count/
collect), i.e. full plan execution including scan. That mirrors how the
reference benches full-file row iteration (benches/parquet.rs) rather
than cached re-runs. The per-query min-max spread rides along so
machine drift (measured 49-77 s total run-to-run on the same code) is
visible instead of masquerading as regressions.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time


def _chunks(items: list, chunk_size: int) -> list[list]:
    return [items[i : i + chunk_size] for i in range(0, len(items), chunk_size)]


def run_chunk(
    chunk: list, sf_dir: str, warm_dir: str, reps: int, budget_left_s: float
) -> dict:
    """Run one chunk of (name, fn) queries in THIS process's JVM and
    return {"timings": .., "spread": .., "reps_used": ..}."""
    from amadeus_spark import get_spark, release_cached

    t0 = time.perf_counter()
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    reps_used: dict[str, int] = {}
    spark = get_spark("amadeus_spark_bench")
    # Warm up JVM + codegen so the first measured query isn't paying
    # session startup (the driver measures engine speed, not boot).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name, fn in chunk:
        try:
            fn(spark, warm_dir).collect()
        except Exception:
            pass  # a warm-up failure surfaces in the timed run
        spark._jvm.System.gc()  # settle accumulated JVM garbage so
        # late queries aren't taxed by earlier allocations
        this_reps = reps if time.perf_counter() - t0 < budget_left_s else 1
        reps_used[name] = this_reps
        runs = []
        for _ in range(this_reps):
            spark.catalog.clearCache()  # dedup queries persist
            release_cached()  # signature frames; clear between reps
            # so each run re-executes the full plan independently
            q0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.collect()  # every query returns a small result set
            runs.append(time.perf_counter() - q0)
        runs.sort()
        mid = len(runs) // 2
        med = runs[mid] if len(runs) % 2 else (runs[mid - 1] + runs[mid]) / 2
        timings[name] = round(med, 4)  # true median (even reps too)
        spread[name] = round(runs[-1] - runs[0], 4)
    return {"timings": timings, "spread": spread, "reps_used": reps_used}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(sf_match.group(1)) if sf_match else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    # Kernel warm-up: run every query once at the SMALLEST scale factor
    # first. First-touch JIT of the hot expression/operator classes
    # (md5/conv, explode+wide agg, window, AQE join conversion) otherwise
    # lands inside whichever heavy query runs them first and inflates it
    # 2-4x with big run-to-run variance (measured: training_pipeline 15s
    # cold vs 4s warm at sf0.1). Running the real plans on sf0.001 warms
    # exactly the right code paths while touching ~1/100th of the data;
    # caches are cleared so no *data* survives into the timed run.
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    # Warm-then-time PER QUERY (not one global warm-up pass): warming all
    # 56 queries before timing any compiles ~112 distinct codegen'd plans
    # up front, and late heavy queries then run against a JIT code cache
    # churned by everything before them (measured: minhash_lsh 8.3 s late
    # in a global-warm-up bench vs 4.6 s when warmed immediately before
    # its own timed run). Per-query warm-up keeps each query's hot
    # methods freshly compiled at its timed run; caches are still cleared
    # so no *data* survives into the timing.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    # Wall-clock budget: the driver runs this under an unknown timeout,
    # and a timed-out bench records as a CRASH, which is strictly worse
    # than single-shot timings. If total elapsed passes the budget,
    # remaining queries degrade to 1 rep (median-of-1); the JSON carries
    # per-query rep counts so degraded timings are identifiable.
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "420"))
    bench_t0 = time.perf_counter()
    # SESSION SPLITTING, in a SUBPROCESS per chunk: ReservedCodeCacheSize
    # is hard-capped at 2 GB by HotSpot, and one long session compiling
    # ~2 codegen plan sets per query overflows it past ~80 queries — the
    # JIT then silently deoptimizes and late heavy queries inflate 2-4×
    # with wild variance (r5 verdict measured minhash median 5.2 s /
    # spread 4.1 s in-bench vs 3.6 s isolated). spark.stop() +
    # getOrCreate() REUSES the same py4j gateway JVM — the code cache is
    # never reset that way (r6 advice) — so each chunk re-execs bench.py
    # in a child process whose JVM is genuinely fresh; the per-chunk
    # warm-up query re-pays JVM+codegen spin-up so chunk boundaries
    # don't tax the first timed query of the next chunk.
    chunk_size = int(os.environ.get("SPARK_GRAFT_BENCH_CHUNK", "64"))
    items = list(queries.items())
    chunks = _chunks(items, chunk_size)
    chunk_idx = os.environ.get("SPARK_GRAFT_BENCH_CHUNK_IDX")
    if chunk_idx is not None:
        # CHILD MODE: run one chunk in this (fresh) process, dump the
        # partial result where the parent asked, and exit.
        part = run_chunk(chunks[int(chunk_idx)], sf_dir, warm_dir, reps, budget_s)
        with open(os.environ["SPARK_GRAFT_BENCH_CHUNK_OUT"], "w") as f:
            json.dump(part, f)
        return

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    reps_used: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for i in range(len(chunks)):
        if len(chunks) == 1:
            part = run_chunk(chunks[i], sf_dir, warm_dir, reps, budget_s)
        else:
            out_path = os.path.join(here, f".bench_chunk_{i}.json")
            env = dict(os.environ)
            env["SPARK_GRAFT_BENCH_CHUNK_IDX"] = str(i)
            env["SPARK_GRAFT_BENCH_CHUNK_OUT"] = out_path
            # children get the REMAINING budget so rep degradation still
            # tracks total wall-clock, not per-chunk clocks
            env["SPARK_GRAFT_BENCH_BUDGET_S"] = str(
                max(0.0, budget_s - (time.perf_counter() - bench_t0))
            )
            subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                check=True,
                stdout=sys.stderr,  # keep THIS process's stdout = the JSON lines
            )
            with open(out_path) as f:
                part = json.load(f)
            os.remove(out_path)
        timings.update(part["timings"])
        spread.update(part["spread"])
        reps_used.update(part["reps_used"])

    total = round(sum(timings.values()), 4)
    full = {
        "metric": "amadeus_spark headline queries wall-clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "reps": reps,
        "reps_used": reps_used,
        "bench_wall_s": round(time.perf_counter() - bench_t0, 1),
        "sf": sf,
    }
    # Full-precision record → file (committed per round) + one stdout
    # line for anyone reading the whole log.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "bench_results.json"), "w") as f:
        json.dump(full, f, indent=1)
    print(json.dumps(full))
    # The driver keeps only the LAST 2000 CHARS of stdout and json-parses
    # the final line (BENCH_r2/r4/r5 recorded parsed:null because the
    # full line outgrew that window as the registry grew). The LAST line
    # is therefore a compact summary guaranteed under the window: total +
    # as many of the SLOWEST per-query timings as fit (the ones perf
    # review cares about), with the full map's location pointed at.
    slowest = sorted(timings.items(), key=lambda kv: (-kv[1], kv[0]))
    compact: dict = {
        "metric": "amadeus_spark headline queries wall-clock",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "queries_full": "bench_results.json",
        "queries": {},
    }
    for name, sec in slowest:
        compact["queries"][name] = sec
        if len(json.dumps(compact, separators=(",", ":"))) > 1800:
            del compact["queries"][name]
            break
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) < 1950, len(line)
    print(line)


if __name__ == "__main__":
    main()
