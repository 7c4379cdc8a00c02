#!/usr/bin/env python3
"""GC/packing probe for the 8->32 single-JVM inflation (follow-up to
tools/twojvm.py, which localized the strong-scaling loss to single-JVM
packing: one heap, one GC, one shuffle manager under 32 threads).

Runs graft.ScalingBench at local[32] over the SAME input under different
collector/heap configurations (plain `java`, fresh JVM per config,
min-of-REPS with in-JVM warmup — the scaling.py protocol), to measure
whether the packing loss is GC-attributable and recoverable by executor
JVM flags a real cluster would set per node.

Writes BENCH/gcprobe.json; prints a md table.
Run AFTER `sbt -batch compile`; do not run other measurements
concurrently. Cross-round knobs: SPARK_GRAFT_PAGES=1000000
SPARK_GRAFT_ENTITIES=20000."""
import json, os, re, subprocess, sys

PAGES = int(os.environ.get("SPARK_GRAFT_PAGES", "1000000"))
ENTITIES = os.environ.get("SPARK_GRAFT_ENTITIES", "20000")
REPS = os.environ.get("SPARK_GRAFT_REPS", "3")
LEVEL = int(os.environ.get("SPARK_GRAFT_LEVEL", "32"))

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

CONFIGS = [
    # (tag, extra JVM flags) — every config keeps -Xmx48g (the scaling.py
    # heap) so the ONLY variable is the collector / generation shape
    ("g1_default", []),
    ("parallel", ["-XX:+UseParallelGC"]),
    ("g1_bigyoung", ["-XX:+UnlockExperimentalVMOptions",
                     "-XX:G1NewSizePercent=40", "-XX:G1MaxNewSizePercent=60"]),
    ("parallel_fixedyoung", ["-XX:+UseParallelGC", "-Xmn24g"]),
]
if os.environ.get("SPARK_GRAFT_GC_ONLY"):
    keep = set(os.environ["SPARK_GRAFT_GC_ONLY"].split(","))
    CONFIGS = [c for c in CONFIGS if c[0] in keep]

def run(tag, flags):
    env = dict(os.environ,
               SPARK_GRAFT_PAGES=str(PAGES), SPARK_GRAFT_ENTITIES=ENTITIES,
               SPARK_GRAFT_MASTER=f"local[{LEVEL}]",
               SPARK_GRAFT_SHUFFLE=str(LEVEL), SPARK_GRAFT_REPS=REPS,
               SPARK_GRAFT_LOCAL_DIR=f"/dev/shm/graft-gc-{tag}",
               SPARK_GRAFT_OUT_BASE=f"/dev/shm/graft-gc-out-{tag}")
    os.makedirs(env["SPARK_GRAFT_OUT_BASE"], exist_ok=True)
    cmd = (["java"] + ADD_OPENS +
           ["-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
            "-Dfile.encoding=UTF-8", "-Xmx48g"] + flags +
           ["-cp", CP, "graft.ScalingBench"])
    p = subprocess.run(cmd, cwd="/root/repo", env=env,
                       capture_output=True, text=True)
    m = re.search(r'\{"metric":"pipeline_throughput".*\}', p.stdout)
    if not m:
        print(p.stdout[-3000:]); print(p.stderr[-3000:]); sys.exit(1)
    return json.loads(m.group(0))

res = {}
for tag, flags in CONFIGS:
    print(f"[gcprobe] {tag}: local[{LEVEL}] x {PAGES} pages "
          f"flags={' '.join(flags) or '(none)'}", flush=True)
    res[tag] = dict(run(tag, flags), flags=flags)
    print(f"[gcprobe]   -> min wall {res[tag]['wall_sec']} s "
          f"walls {res[tag]['walls']}", flush=True)

rows = {r["graph_rows"] for r in res.values()}
assert len(rows) == 1, f"nondeterministic graph: {rows}"

base = (res.get("g1_default") or list(res.values())[0])["wall_sec"]
out = {"metric": "gc_probe", "level": LEVEL, "pages": PAGES,
       "graph_rows": res["g1_default"]["graph_rows"],
       "configs": {t: {"wall_sec": r["wall_sec"], "walls": r["walls"],
                        "triples_per_sec": r["triples_per_sec"],
                        "flags": r["flags"],
                        "vs_g1": round(base / r["wall_sec"], 3)}
                   for t, r in res.items()}}
with open("/root/repo/BENCH/gcprobe.json", "w") as f:
    json.dump(out, f, indent=1)
print(json.dumps(out))

print("\n| config | flags | min wall (s) | walls | speedup vs G1 |")
print("|---|---|---|---|---|")
for t, r in res.items():
    print(f"| {t} | `{' '.join(r['flags']) or '(default)'}` | "
          f"{r['wall_sec']:.2f} | {r['walls']} | {base / r['wall_sec']:.3f}x |")
