#!/usr/bin/env python3
"""Two-parallelism scaling measurement (stand-in for N vs 4N executors):
runs graft.ScalingBench once per level (fresh JVM per level; min-of-N
repetitions inside each JVM to ride out the sandbox's bursty CPU steal),
and writes BENCH/BASELINE.md with:
  - STRONG scaling (same input at every level): efficiency for 2->8, 8->32
  - WEAK scaling (input scaled with threads, same per-core work): the
    memory-bus-ceiling-insensitive view; ideal = equal walls per level.
Weak legs reuse the strong runs where the (level, pages) pair coincides,
so the whole batch costs two extra JVM runs."""
import json, os, re, subprocess, sys

PAGES = int(os.environ.get("SPARK_GRAFT_PAGES", "300000"))
ENTITIES = os.environ.get("SPARK_GRAFT_ENTITIES", "10000")
REPS = os.environ.get("SPARK_GRAFT_REPS", "3")
LEVELS = [int(x) for x in os.environ.get("SPARK_GRAFT_LEVELS", "2,8,32").split(",")]
WEAK = os.environ.get("SPARK_GRAFT_WEAK", "1") == "1"

def run(level, pages):
    env = dict(os.environ, SPARK_GRAFT_PAGES=str(pages), SPARK_GRAFT_ENTITIES=ENTITIES,
               SPARK_GRAFT_MASTER=f"local[{level}]", SPARK_GRAFT_SHUFFLE=str(level),
               SPARK_GRAFT_REPS=REPS,
               SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "48g"),
               SPARK_GRAFT_LOCAL_DIR="/dev/shm/graft-spark-local",
               SPARK_GRAFT_OUT_BASE="/dev/shm/graft-out")
    p = subprocess.run(["sbt", "-batch", "runMain graft.ScalingBench"],
                       cwd="/root/repo", env=env, capture_output=True, text=True)
    m = re.search(r'\{"metric":"pipeline_throughput".*\}', p.stdout)
    if not m:
        print(p.stdout[-3000:]); print(p.stderr[-3000:]); sys.exit(1)
    return json.loads(m.group(0))

res = {lvl: run(lvl, PAGES) for lvl in LEVELS}
rows = {r["graph_rows"] for r in res.values()}
assert len(rows) == 1, f"nondeterministic graph: {rows}"

def eff(lo, hi):
    return (res[hi]["triples_per_sec"] / res[lo]["triples_per_sec"]) / (hi / lo)

pairs = [(LEVELS[i], LEVELS[i + 1]) for i in range(len(LEVELS) - 1)]

# ---- weak scaling: level k runs PAGES * k / max_level pages, so per-core
# work is constant across levels; the max level reuses the strong run.
weak = {}
weak_pairs = []
if WEAK:
    top = max(LEVELS)
    for lvl in LEVELS:
        pages_w = PAGES * lvl // top
        weak[lvl] = res[lvl] if lvl == top else run(lvl, pages_w)
        weak[lvl] = dict(weak[lvl], pages=pages_w)
    weak_pairs = pairs

def weff(lo, hi):
    # ideal: equal walls (input grew with threads) -> efficiency = T_lo/T_hi
    return weak[lo]["wall_sec"] / weak[hi]["wall_sec"]

out = {"metric": "scaling_efficiency", "pages": PAGES,
       "graph_rows": res[LEVELS[0]]["graph_rows"],
       "levels": {str(l): {"wall_sec": r["wall_sec"], "walls": r["walls"],
                            "triples_per_sec": r["triples_per_sec"]}
                  for l, r in res.items()},
       "efficiency": {f"{lo}->{hi}": round(eff(lo, hi), 4) for lo, hi in pairs}}
if WEAK:
    out["weak"] = {
        "levels": {str(l): {"pages": w["pages"], "wall_sec": w["wall_sec"],
                            "walls": w["walls"],
                            "triples_per_sec": w["triples_per_sec"]}
                   for l, w in weak.items()},
        "efficiency": {f"{lo}->{hi}": round(weff(lo, hi), 4) for lo, hi in weak_pairs}}
print(json.dumps(out))

rows_md = "\n".join(
    f"| local[{l}] | {r['wall_sec']:.2f} | {r['walls']} | {r['triples_per_sec']:.1f} |"
    for l, r in res.items())
eff_md = "\n".join(
    f"- **local[{lo}] → local[{hi}]** (N vs {hi//lo}N cores): efficiency = "
    f"({res[hi]['triples_per_sec']:.1f} / {res[lo]['triples_per_sec']:.1f}) / {hi//lo} "
    f"= **{eff(lo, hi):.3f}**" for lo, hi in pairs)

weak_md = ""
if WEAK:
    wrows = "\n".join(
        f"| local[{l}] | {w['pages']} | {w['wall_sec']:.2f} | {w['walls']} | "
        f"{w['triples_per_sec']:.1f} |" for l, w in weak.items())
    weffs = "\n".join(
        f"- **local[{lo}] → local[{hi}]** ({hi//lo}× input at {hi//lo}× threads): "
        f"weak efficiency = {weak[lo]['wall_sec']:.2f} / {weak[hi]['wall_sec']:.2f} "
        f"= **{weff(lo, hi):.3f}**" for lo, hi in weak_pairs)
    weak_md = f"""
## Weak scaling (input grows with threads — same per-core work)

Each level processes `pages × level / {max(LEVELS)}` pages, so per-core work
is constant; IDEAL is equal walls (efficiency 1.0 = wall_lo / wall_hi).
Unlike strong scaling, this view is not penalized by a fixed memory-bus
budget being split across more threads on one box — it is the dimension a
real cluster scales along (more data, more executors).

| parallelism | pages | min wall (s) | all walls (s) | triples/sec |
|---|---|---|---|---|
{wrows}

{weffs}
"""

md = f"""## Measured scaling (same job, multiple parallelism levels, same input)

Full KG pipeline (generate → extract → mentions → link → CC → emit →
materialize, stage snapshots + lineage on) over {PAGES} deterministic
synthetic pages / {ENTITIES} entities. One fresh JVM per level; inside each
JVM one warmup run then {REPS} timed repetitions, reporting the MINIMUM wall
(this sandbox VM shows bursty CPU steal from co-tenants — the min is the
least-interfered measurement). Shuffle + snapshot I/O on tmpfs (/dev/shm),
standing in for cluster-local NVMe; `local[k]` threads stand in for k
executor cores (driver instruction; no real cluster in this sandbox).

| parallelism | min wall (s) | all walls (s) | triples/sec |
|---|---|---|---|
{rows_md}

{eff_md}
{weak_md}
Target ≥ 0.8 per BASELINE.json between N and 4N. Caveats measured on this
box: (a) single-JVM local mode shares one heap/GC and one memory bus, unlike
a real 4N-executor cluster; per-task CPU time inflates ~2.4× from 8→32
threads on shuffle-heavy stages (measured via task metrics: identical work,
335s aggregate CPU at local[8] vs 808s at local[32] pre-optimization) — a
memory-bandwidth/SMT ceiling, not a plan property; (b) co-tenant CPU steal
adds run-to-run variance up to 2× on this host. The plan-level scaling
properties (partition-parallel stages, broadcast-not-shuffle joins,
salted writes, AQE) are what transfer to a real cluster.
"""
os.makedirs("/root/repo/BENCH", exist_ok=True)
open("/root/repo/BENCH/BASELINE.md", "w").write(md)
