"""Batched oracle sweep — the scale-SF form of the correctness gate.

Runs the full 50-row registry against DuckDB at a scale dataset (gen10)
in FRESH oracle_check subprocesses, a few in parallel:

    python tools/oracle_sweep.py /tmp/scale/gen10 [n_batches n_parallel]

Why not one oracle_check marathon: a single long-lived process degrades
as the inventory proceeds — the same marathon artifact BENCH_SCALE.md
documents for the JVM also hits the Python/DuckDB side (measured r9:
`ns_semantic_dedup`'s oracle executes in ~39 s in a fresh process and
334 s late in a 50-query marathon, ~2 effective cores with 32 DuckDB
threads; `ns_pq_ivfadc` 5.5 s fresh vs 258 s in-marathon). Fresh
processes per batch kill the artifact, and batch parallelism overlaps
the independent (spark, duckdb) pipelines — this is a CORRECTNESS
gate, not a timing artifact, so parallelism is free. Per-query timing
claims still come from tools/timeq.py / bench.py, never from here.

Batches are round-robin over registration order so each gets a mix of
heavy and light rows. Each subprocess gets local[cpus/n_parallel] and
a bounded driver heap; the digest pool inside each subprocess shrinks
the same way.

Two-phase scheduling (r11, VERDICT ask #3): the r10 sweep's worst
"marathon decay" rows turned out to be CONTENTION, not JVM decay — once
oracle_check cleared caches between rows, the remaining inflation came
from four heavy batches overlapping on 32 cores (measured r11 at gen10:
ns_dsir_select 28.8 s spark fresh vs 402.8 s in-sweep, ns_minhash 15.9
vs 165.4 — each ~3-4x CPU oversubscription compounding across spark +
duckdb + digest pools). So the known-heavy rows now run in their OWN
sequential phase, one fresh full-width subprocess per row (in-marathon
== fresh by construction), and only the light rows share the parallel
batch phase, where the oversubscription bound keeps worst-case
inflation ~n_parallel-ish and the absolute seconds small.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

# Rows whose spark or oracle side is heavy enough at gen10 that
# overlapping them quadruples everyone's wall time (measured r11
# in-sweep seconds under the old all-parallel schedule: pl_monthly
# 1544, pl_details 1509, sem_dedup 721, pl_totals 705, dsir 530,
# minhash 415, copy_students 178, flagship 137, f_scalar 114). Each
# runs alone, full-width, in its own fresh subprocess.
HEAVY = [
    "pl_monthly_subject_fact",
    "pl_transcript_details",
    "pl_transcript_totals",
    "ns_semantic_dedup",
    "ns_dsir_select",
    "ns_minhash_neardup",
    "pl_copy_students",
    "flagship_wide_fact",
    "f_scalar_suite",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale/gen10"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_parallel = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import __spark_entry__ as entrymod

    names = list(entrymod.queries())
    stale = [h for h in HEAVY if h not in names]
    if stale:
        # A renamed/rotated heavy row would silently rejoin the parallel
        # light phase and reintroduce the contention inflation the
        # two-phase split exists to fix — keep the list honest.
        print(
            f"WARNING: oracle_sweep.HEAVY names not in the registry: "
            f"{stale} — update HEAVY after the rotation",
            flush=True,
        )
    heavy = [n for n in names if n in HEAVY]
    light = [n for n in names if n not in HEAVY]
    batches = [light[i::n_batches] for i in range(n_batches)]
    # Heavy rows append as single-row "batches" that run with
    # parallelism 1 and full cores (see the scheduling loop).
    batches += [[h] for h in heavy]
    n_light_batches = n_batches

    # Materialize the shared synthetic-warehouse oracle prefix ONCE per
    # fixture BEFORE spawning batches (r12, VERDICT r11 ask #3): the
    # four pipeline oracles then read its parquet instead of each
    # re-running the lineitem⨝orders fact + reps arg_max — the heavy
    # phase's dominant cost. Children see SPARK_GRAFT_ORACLE_WH=1 and
    # rewrite by exact-substring replacement (tools/oracle_check.py);
    # the sf0.01 driver-replica gate never sets the flag.
    from tools.oracle_check import materialize_warehouse

    t_wh = time.time()
    wh_dir = materialize_warehouse(sf_dir)
    print(f"warehouse prefix materialized in {time.time()-t_wh:.0f}s "
          f"-> {wh_dir}", flush=True)

    cpus = os.cpu_count() or 8
    per_proc = max(4, cpus // n_parallel)
    env = dict(
        os.environ,
        SPARK_GRAFT_ORACLE_WH="1",
        SPARK_GRAFT_ORACLE_CPUS=str(per_proc),
        SPARK_GRAFT_ORACLE_DRIVER_MEM=os.environ.get(
            "SPARK_GRAFT_ORACLE_DRIVER_MEM", "16g"
        ),
        SPARK_GRAFT_ORACLE_POOL=str(per_proc),
    )
    heavy_env = dict(
        env,
        SPARK_GRAFT_ORACLE_CPUS=str(cpus),
        SPARK_GRAFT_ORACLE_POOL=str(max(4, cpus // 2)),
    )

    t0 = time.time()
    running: list[tuple[int, subprocess.Popen]] = []
    outputs: dict[int, str] = {}
    errs: dict[int, tuple[int, str]] = {}  # batch -> (returncode, stderr tail)
    pending = list(enumerate(batches))
    while pending or running:
        # Light batches overlap up to n_parallel; a heavy batch starts
        # only once it can run ALONE and blocks everything else while
        # it does (its fresh full-width subprocess IS the row's fresh
        # timing — no contention inflation to misread as decay).
        while pending and len(running) < n_parallel:
            if pending[0][0] >= n_light_batches and running:
                break  # heavy next: wait for the lights to drain
            i, batch = pending.pop(0)
            is_heavy = i >= n_light_batches
            # stderr is CAPTURED, not discarded: a batch that dies before
            # printing (OOM kill, Spark startup failure) must surface its
            # returncode + stderr tail, or the gate goes silently green
            # on crashed rows (r9 ADVICE).
            p = subprocess.Popen(
                [sys.executable, os.path.join(HERE, "oracle_check.py"),
                 sf_dir, *batch],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, env=heavy_env if is_heavy else env,
            )
            running.append((i, p))
            if is_heavy:
                break  # run this heavy row alone
        i, p = running[0]
        out, err = p.communicate()
        outputs[i] = out
        if p.returncode != 0:
            # Nonzero is expected when the batch printed FAIL lines
            # (oracle_check exits 1 on any failure) — those are counted
            # below. Only record as a crash if the row accounting comes
            # up short, but keep the stderr tail for the summary either way.
            errs[i] = (p.returncode, "\n".join(err.splitlines()[-12:]))
        running.pop(0)

    ok = bad = 0
    reported: set[str] = set()
    name_set = set(names)
    for i in sorted(outputs):
        for line in outputs[i].splitlines():
            if line.startswith(("OK", "FAIL", "ok*")):
                # Count ONLY lines whose second token is a registry row
                # (oracle_check collapses exception text to one line,
                # but a stray stdout line starting with OK/FAIL must
                # still not skew the tally — r10 ADVICE).
                parts = line.split()
                if len(parts) < 2 or parts[1].rstrip(":") not in name_set:
                    continue
                print(line)
                reported.add(parts[1].rstrip(":"))
                ok += line.startswith(("OK", "ok*"))
                bad += line.startswith("FAIL")
    # EVERY registry row must have produced a result line — a subprocess
    # that crashed mid-batch reports fewer rows than it was assigned, and
    # the gate must go red, not silently green (no-silent-caps rule).
    # Near-threshold margin probe (r9 ADVICE): the semantic-dedup oracle's
    # native list_inner_product could flip a pair across _SEM_THRESH on
    # summation order vs Spark. Count pairs within 1e-9 of the threshold at
    # THIS dataset so a flip is diagnosed, not debugged from a digest.
    margin_note = ""
    if "ns_semantic_dedup" in names:
        try:
            import duckdb

            from clickhouse_etl_spark.queries.northstar import (
                _semantic_margin_sql,
            )
            from tools.oracle_check import open_oracle_views

            con = open_oracle_views(sf_dir)
            n_near = con.execute(_semantic_margin_sql()).fetchone()[0]
            con.close()
            margin_note = f", sem-margin pairs within 1e-9: {n_near}"
            if n_near:
                print(f"WARN  ns_semantic_dedup: {n_near} pair(s) within "
                      "1e-9 of the cosine threshold — digest mismatches on "
                      "this row may be float-order flips, not logic bugs")
        except Exception as e:  # probe must never mask the gate result
            margin_note = f", sem-margin probe error: {e}"

    missing = sorted(set(names) - reported)
    if missing:
        print(f"\nMISSING {len(missing)} rows (subprocess died?): {missing}")
        # Only the batches that actually lost rows get their stderr
        # dumped (r10 ADVICE): a batch whose rc!=0 came from ordinary
        # FAIL rows reported every name and its stderr is just noise.
        missing_set = set(missing)
        for i, (rc, tail) in sorted(errs.items()):
            if missing_set & set(batches[i]):
                print(f"--- batch {i} rc={rc} stderr tail ---\n{tail}")
    total = ok + bad
    print(f"\n{ok}/{total} passed, {len(missing)} missing of {len(names)} "
          f"(wall {time.time()-t0:.0f}s, "
          f"{n_batches} batches x local[{per_proc}], {n_parallel} parallel"
          f"{margin_note})")
    return 1 if (bad or missing) else 0


if __name__ == "__main__":
    raise SystemExit(main())
