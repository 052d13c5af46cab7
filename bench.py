"""Benchmark harness — run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
JSON: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. The FINAL stdout line is a compact
(<2000-char) summary sized to the driver's tail window; the line before
it and bench_results.json carry the full per-query map.

Each query is timed as full executions after a per-query warm-up;
timing is wall-clock around the terminal action (count/collect), i.e.
full plan execution including scan. That mirrors how the reference
benches full-file row iteration (benches/parquet.rs) rather than
cached re-runs. The per-query min-max spread rides along so machine
drift (measured 49-77 s total run-to-run on the same code) is visible
instead of masquerading as regressions.

Rep protocol: every query first runs ONCE UNREPORTED at the timed sf
(the warm-up — it pays codegen/JIT of the exact sf-scale plan shape
and first-touch page cache), then 1..$SPARK_GRAFT_BENCH_REPS TIMED
reps; the reported value is the min of the timed reps, which are all
warm — the same steady-state quantity median-of-3 reported when this
bench ran fixed 3 reps (median of [cold, warm, warm] = warm). Extra
timed reps are granted while PREDICTED spend (elapsed + last rep as
the estimate; the chunk clock starts after JVM boot) stays under a
cumulative fair-share line with a 10%-of-slice headstart — and the
TOTAL budget defaults to 7.5 s × the registry size, ~2x a normal
run's full warm+2-rep need, so on a healthy box the line NEVER fires
and every query gets its full reps. The line exists for pathological
runs only: the old global sequential budget let the heavy first chunk
eat the entire allowance and degraded every later chunk to single
COLD runs, inflating those entries 1.5-4x (two r8 runs measured
exactly that), while two r10 experiments showed any budget TIGHT to
the need (uniform slope at 5 s/query, observed-mean reserve) wrongly
starves contiguous heavy blocks whose cost exceeds their count share.
Degradation only ever costs spread precision (1 timed rep instead of
2); the reported number stays a warm measurement. Each chunk gets a
slice proportional to its query count, so chunks can't starve each
other; only a catastrophic overrun (2x the chunk slice) drops the
warm-up run.
"""

from __future__ import annotations

import json
import math
import os
import re
import subprocess
import sys
import time


def _chunks(items: list, chunk_size: int) -> list[list]:
    return [items[i : i + chunk_size] for i in range(0, len(items), chunk_size)]


def _noise_sentinel() -> dict:
    """Machine-noise self-attribution: a FIXED pure-python CPU spin
    (no JVM, no I/O — its wall time moves only with CPU contention /
    frequency state) plus the 1-min load average. Recorded per chunk
    into bench_results.json so a dirty-box run identifies itself:
    on a quiet box the spin is stable (~±10%) across chunks and
    rounds; a +23%-wall run whose spins are inflated too is machine
    drift, not a code regression (the r12 driver artifact took manual
    isolated probes to prove — this field replaces that)."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(2_000_000):
        acc = (acc * 1103515245 + i) & 0xFFFFFFFF
    spin_ms = (time.perf_counter() - t0) * 1000
    try:
        load1 = os.getloadavg()[0]
    except OSError:
        load1 = -1.0
    # The spin is contention-blind in one axis (r14 adjudication): a
    # just-finished heavy job shows up in load1 (runnable backlog, page
    # cache churn, JVM reclaim) while instantaneous spins read quiet —
    # the r14 driver chunk-1 spun 235 ms (quiet band) at load1 6.21 and
    # exactly its heavies inflated 2-4.8x. The flag is meaningful ONLY
    # for the FIRST chunk: later chunks' pre-boot load1 reflects the
    # bench's OWN just-finished chunk (quiet r13/r14 records show
    # 2.4-6.9 there) — compare those across rounds instead.
    first = os.environ.get("SPARK_GRAFT_BENCH_CHUNK_IDX", "0") == "0"
    return {
        "spin_ms": round(spin_ms, 1),
        "load1": round(load1, 2),
        "dirty": bool(first and load1 > 2.0),
    }


def run_chunk(
    chunk: list, sf_dir: str, reps: int, slice_s: float
) -> dict:
    """Run one chunk of (name, fn) queries in THIS process's JVM and
    return {"timings": .., "spread": .., "reps_used": ..}.

    ``slice_s`` is this chunk's own budget slice (proportional to its
    query count — see module docstring); ``reps`` is the max TIMED
    reps per query (the unreported warm-up run is extra)."""
    from amadeus_spark import get_spark, release_cached

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    reps_used: dict[str, int] = {}
    noise = _noise_sentinel()  # BEFORE boot: the box as the chunk found it
    spark = get_spark("amadeus_spark_bench")
    # Warm up JVM + codegen so the first measured query isn't paying
    # session startup (the driver measures engine speed, not boot).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # The slice budgets QUERY work: the clock starts AFTER boot (boot
    # is bounded — one per chunk — and counting it against the slice
    # silently cost the first ~4 queries of every chunk their 2nd rep).
    t0 = time.perf_counter()

    def one_run(fn) -> float:
        spark.catalog.clearCache()  # dedup queries persist
        release_cached()  # signature frames; clear between reps
        # so each run re-executes the full plan independently
        q0 = time.perf_counter()
        fn(spark, sf_dir).collect()  # every query returns a small result
        return time.perf_counter() - q0

    for i, (name, fn) in enumerate(chunk):
        q0 = time.perf_counter()
        if q0 - t0 < 2.0 * slice_s:
            try:
                one_run(fn)  # WARM-UP at the timed sf — unreported;
                # pays codegen/JIT + page cache so the timed reps are
                # steady-state. A failure here surfaces in the timed run.
            except Exception:
                pass
        # else: catastrophic overrun — skip the warm-up, record one
        # cold run (a timed-out bench records as a crash, strictly
        # worse than one cold timing).
        spark._jvm.System.gc()  # settle the warm-up's garbage BEFORE
        # timing: broadcast/persist-heavy queries degrade run-over-run
        # without it (measured: hard_negatives 3.9 -> 5.8 -> 15.4 s in
        # one JVM gc-less, stable ~4 s with a gc between runs) and the
        # pauses land inside LATER queries' timed reps. The call itself
        # costs ~0.15 s on this heap — cheap insurance, per query.
        runs = [one_run(fn)]
        # Further timed reps only while PREDICTED spend (elapsed + the
        # last rep as the estimate — an about-to-overrun heavy skips
        # instead of blowing the tail's allowance) stays under the
        # cumulative fair-share line, 10%-of-slice headstart so chunk-
        # head heavies can afford their 2nd rep. The line exists for
        # PATHOLOGICAL runs only (dirty machine, driver timeout risk):
        # the budget is sized (7.5 s/query) so a normal run's full
        # warm+2-rep need sits ~2x under every chunk's slice and
        # nothing is ever denied — two r10 experiments showed any
        # TIGHT line (uniform slope at 5 s/query, observed-mean
        # reserve) wrongly starves contiguous heavy blocks whose cost
        # exceeds their count share. Degradation costs spread
        # precision (1 timed rep), never warmth.
        fair_line = slice_s * (0.1 + (i + 1) / max(1, len(chunk)))
        while (
            len(runs) < reps
            and time.perf_counter() - t0 + runs[-1] < fair_line
        ):
            runs.append(one_run(fn))
        reps_used[name] = len(runs)
        runs.sort()
        timings[name] = round(runs[0], 4)  # min of warm timed reps
        spread[name] = round(runs[-1] - runs[0], 4)
    return {
        "timings": timings,
        "spread": spread,
        "reps_used": reps_used,
        "noise": noise,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_match = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(sf_match.group(1)) if sf_match else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    # Probe mode: SPARK_GRAFT_BENCH_ONLY="a,b,c" restricts the run to
    # the named queries under the EXACT bench protocol (fresh-JVM
    # chunk, sf-scale warm-up, gc, fair-share reps) — the isolated
    # re-measure tool for watch-list items; ad-hoc probe scripts skip
    # the protocol and have misattributed drift before.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in names if n not in queries]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
        queries = {n: queries[n] for n in names}

    # Warm-then-time PER QUERY (not one global warm-up pass): warming all
    # queries before timing any compiles ~2 codegen'd plan sets per query
    # up front, and late heavy queries then run against a JIT code cache
    # churned by everything before them (measured: minhash_lsh 8.3 s late
    # in a global-warm-up bench vs 4.6 s when warmed immediately before
    # its own timed run). The warm-up runs at the TIMED sf (an sf0.001
    # warm pass left the first sf0.1 rep paying codegen of the AQE plan
    # shapes that only appear at scale — measured 1.5-4x inflation on
    # single-rep timings); caches are cleared between runs so no *data*
    # survives into the timing.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
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
    # don't tax the first timed query of the next chunk. Chunks are
    # BALANCED (ceil-split) so slices and code-cache pressure are even.
    chunk_cap = int(os.environ.get("SPARK_GRAFT_BENCH_CHUNK", "64"))
    items = list(queries.items())
    # Wall-clock budget: the driver runs this under an unknown timeout,
    # and a timed-out bench records as a CRASH. The default SCALES WITH
    # THE REGISTRY (7.5 s/query ≈ 2x the measured warm-up + 2 timed
    # reps + gc need at sf0.1 — chunk full needs measured 129/144/202 s
    # vs 235 s count-proportional slices, and any budget TIGHT to the
    # need makes the fair line wrongly starve contiguous heavy blocks)
    # — a fixed total silently degraded 90/138 queries to reps=1 as
    # the registry grew, making sub-1.5× per-query deltas
    # unmeasurable. Each chunk gets a slice proportional to its query
    # count; inside a chunk the fair-share line decides who gets the
    # 2nd timed rep (see run_chunk).
    budget_s = float(
        os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S")
        or max(90.0, 7.5 * len(items))
    )
    n_chunks = max(1, math.ceil(len(items) / chunk_cap))
    chunks = _chunks(items, math.ceil(len(items) / n_chunks))
    chunk_idx = os.environ.get("SPARK_GRAFT_BENCH_CHUNK_IDX")
    if chunk_idx is not None:
        # CHILD MODE: run one chunk in this (fresh) process, dump the
        # partial result where the parent asked, and exit. budget_s
        # arrives already sliced by the parent.
        part = run_chunk(chunks[int(chunk_idx)], sf_dir, reps, budget_s)
        with open(os.environ["SPARK_GRAFT_BENCH_CHUNK_OUT"], "w") as f:
            json.dump(part, f)
        return

    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    reps_used: dict[str, int] = {}
    noise: list[dict] = []
    here = os.path.dirname(os.path.abspath(__file__))
    for i in range(len(chunks)):
        if len(chunks) == 1:
            part = run_chunk(chunks[i], sf_dir, reps, budget_s)
        else:
            out_path = os.path.join(here, f".bench_chunk_{i}.json")
            env = dict(os.environ)
            env["SPARK_GRAFT_BENCH_CHUNK_IDX"] = str(i)
            env["SPARK_GRAFT_BENCH_CHUNK_OUT"] = out_path
            # each child gets its PROPORTIONAL slice of the budget —
            # a heavy early chunk can degrade only itself, never starve
            # a later chunk (the r8 cold-tail artifact)
            env["SPARK_GRAFT_BENCH_BUDGET_S"] = str(
                budget_s * len(chunks[i]) / len(items)
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
        noise.append(part.get("noise", {}))

    total = round(sum(timings.values()), 4)
    dirty_chunks = sum(1 for n in noise if n.get("dirty"))
    full = {
        "metric": "amadeus_spark headline queries wall-clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "reps": reps,
        "reps_used": reps_used,
        "bench_wall_s": round(time.perf_counter() - bench_t0, 1),
        # per-chunk machine-noise sentinel (see _noise_sentinel): file
        # + full stdout line only — never the compact last line
        "noise": noise,
        # chunks whose PRE-BOOT load1 exceeded the dirty threshold:
        # their timings ran on a contended box — compare noise before
        # calling any of their queries a regression
        "dirty_chunks": dirty_chunks,
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
        "dirty_chunks": dirty_chunks,
        "queries_full": "bench_results.json",
        "queries": {},
    }
    for name, sec in slowest:
        compact["queries"][name] = sec
        if len(json.dumps(compact, separators=(",", ":"))) > 1800:
            del compact["queries"][name]
            break
    # Truncation vs removal must be distinguishable from the compact
    # line alone: a sub-cutoff query that speeds up "disappears" from
    # the slowest-N map and the driver's dropped-from-bench heuristic
    # misfires (r15 PERF flagged 6 phantom drops). queries_omitted = how
    # many timed queries the window truncated (all present in the file).
    compact["queries_omitted"] = len(timings) - len(compact["queries"])
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) < 1950, len(line)
    print(line)


if __name__ == "__main__":
    main()
