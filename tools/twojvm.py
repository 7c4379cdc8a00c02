#!/usr/bin/env python3
"""Two-JVM strong-scaling probe: is the 8->32 single-JVM inflation a
property of the PLAN or of packing 32 threads into one JVM/heap?

Three co-measured configurations over the same total work (P pages,
min-of-REPS walls, in-JVM warmup, plain `java` so two JVMs never fight
the sbt lock):
  1. single32  : 1 JVM  local[32], P pages          (the scoreboard shape)
  2. single16  : 1 JVM  local[16], P/2 pages, alone (per-JVM baseline)
  3. dual16    : 2 JVMs local[16], P/2 pages each, CONCURRENT
                 (a poor-man's two-executor cluster: each "executor" has
                 its own heap/GC/shuffle manager; the host bus is shared)

dual16 throughput = total rows / max(wallA, wallB).
  - dual16 >> single32  => the inflation lives in the single JVM (GC,
    allocator, shuffle-writer contention) and DISAPPEARS on a real
    cluster of per-node executors;
  - dual16 ~= single32  => the host memory bus is the ceiling — also a
    per-node property a multi-node cluster does not share, but then the
    local probe cannot beat it.
interference = dual16 per-JVM wall / single16 wall (our own co-tenancy).

Writes BENCH/twojvm_probe.json; prints a md table to merge into
BENCH/BASELINE.md. Run AFTER `sbt -batch compile`; uses the same env
knobs as tools/scaling.py (SPARK_GRAFT_PAGES=1000000
SPARK_GRAFT_ENTITIES=20000 for cross-round comparability)."""
import json, os, re, subprocess, sys, threading

PAGES = int(os.environ.get("SPARK_GRAFT_PAGES", "1000000"))
ENTITIES = os.environ.get("SPARK_GRAFT_ENTITIES", "20000")
REPS = os.environ.get("SPARK_GRAFT_REPS", "3")

ADD_OPENS = []
for p in ["java.base/java.lang", "java.base/java.lang.invoke",
          "java.base/java.lang.reflect", "java.base/java.io",
          "java.base/java.net", "java.base/java.nio",
          "java.base/java.util", "java.base/java.util.concurrent",
          "java.base/java.util.concurrent.atomic",
          "java.base/sun.nio.ch", "java.base/sun.nio.cs",
          "java.base/sun.security.action", "java.base/sun.util.calendar"]:
    ADD_OPENS += ["--add-opens", f"{p}=ALL-UNNAMED"]

CP = "/opt/spark/jars/*:/root/repo/target/scala-2.13/classes"

def run(tag, level, pages, heap):
    env = dict(os.environ,
               SPARK_GRAFT_PAGES=str(pages), SPARK_GRAFT_ENTITIES=ENTITIES,
               SPARK_GRAFT_MASTER=f"local[{level}]",
               SPARK_GRAFT_SHUFFLE=str(level), SPARK_GRAFT_REPS=REPS,
               SPARK_GRAFT_LOCAL_DIR=f"/dev/shm/graft-2jvm-{tag}",
               SPARK_GRAFT_OUT_BASE=f"/dev/shm/graft-2jvm-out-{tag}")
    os.makedirs(env["SPARK_GRAFT_OUT_BASE"], exist_ok=True)
    cmd = (["java"] + ADD_OPENS +
           ["-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
            "-Dfile.encoding=UTF-8", f"-Xmx{heap}", "-cp", CP,
            "graft.ScalingBench"])
    p = subprocess.run(cmd, cwd="/root/repo", env=env,
                       capture_output=True, text=True)
    m = re.search(r'\{"metric":"pipeline_throughput".*\}', p.stdout)
    if not m:
        print(p.stdout[-3000:]); print(p.stderr[-3000:]); sys.exit(1)
    return json.loads(m.group(0))

print(f"[twojvm] single32: local[32] x {PAGES} pages", flush=True)
single32 = run("s32", 32, PAGES, "48g")
print(f"[twojvm] single16: local[16] x {PAGES // 2} pages (alone)", flush=True)
single16 = run("s16", 16, PAGES // 2, "32g")

print(f"[twojvm] dual16: 2 x local[16] x {PAGES // 2} pages, concurrent", flush=True)
dual = [None, None]
def worker(i):
    dual[i] = run(f"d16{i}", 16, PAGES // 2, "32g")
ts = [threading.Thread(target=worker, args=(i,)) for i in (0, 1)]
for t in ts: t.start()
for t in ts: t.join()

rows_total = dual[0]["graph_rows"] + dual[1]["graph_rows"]
dual_wall = max(dual[0]["wall_sec"], dual[1]["wall_sec"])
dual_thr = rows_total / dual_wall
s32_thr = single32["triples_per_sec"]
s16_thr = single16["triples_per_sec"]

out = {
    "metric": "twojvm_probe", "pages": PAGES, "entities": int(ENTITIES),
    "single32": single32, "single16_half": single16,
    "dual16_half": {"walls": [dual[0]["wall_sec"], dual[1]["wall_sec"]],
                     "rep_walls": [dual[0]["walls"], dual[1]["walls"]],
                     "rows_total": rows_total, "wall_sec": dual_wall,
                     "triples_per_sec": round(dual_thr, 1)},
    "dual_vs_single32": round(dual_thr / s32_thr, 4),
    "dual_scaleout_eff_vs_single16": round(dual_thr / (2 * s16_thr), 4),
    "interference_wall_ratio": round(dual_wall / single16["wall_sec"], 4),
}
with open("BENCH/twojvm_probe.json", "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))

print(f"""
| configuration | wall (min of {REPS}) | triples/s |
|---|---|---|
| 1 JVM local[32], {PAGES} pages | {single32['wall_sec']:.2f} s | {s32_thr:.1f} |
| 1 JVM local[16], {PAGES//2} pages (alone) | {single16['wall_sec']:.2f} s | {s16_thr:.1f} |
| 2 JVM local[16], {PAGES//2} pages each (concurrent) | {dual_wall:.2f} s (max of {dual[0]['wall_sec']:.2f}/{dual[1]['wall_sec']:.2f}) | {dual_thr:.1f} |

- dual16 vs single32 (same cores, same total work): **{dual_thr/s32_thr:.3f}x**
- dual16 scale-out efficiency vs one lone local[16]: **{dual_thr/(2*s16_thr):.3f}**
- co-tenancy wall inflation between our own two JVMs: **{dual_wall/single16['wall_sec']:.3f}x**
""")
