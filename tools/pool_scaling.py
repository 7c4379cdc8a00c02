#!/usr/bin/env python3
"""Pool scaling batches: take the per-level MINIMUM wall across all batch
logs given on argv (each containing one scaling.py JSON line) and rewrite
BENCH/BASELINE.md with the pooled table — the per-batch protocol is
scaling.py's (fresh JVM per level, warmup + N timed reps); pooling across
batches is the round-2 protocol for riding out co-tenant CPU-steal bursts
(the minimum is the least-interfered measurement).

Usage: pool_scaling.py LOG [LOG...] > summary.json
"""
import json, re, sys

batches = []
for path in sys.argv[1:]:
    text = open(path).read()
    m = re.findall(r'\{"metric": "scaling_efficiency".*\}', text)
    if not m:
        sys.exit(f"no scaling JSON in {path}")
    batches.append(json.loads(m[-1]))

pages = batches[0]["pages"]
rows = {b["graph_rows"] for b in batches}
assert len(rows) == 1, f"nondeterministic graph across batches: {rows}"
graph_rows = rows.pop()

levels = sorted({int(l) for b in batches for l in b["levels"]})
pooled = {}
for l in levels:
    # a batch may have measured only a subset of levels — pool what exists
    walls_per_batch = [b["levels"][str(l)]["walls"] for b in batches
                      if str(l) in b["levels"]]
    all_walls = [w for ws in walls_per_batch for w in ws]
    mn = min(all_walls)
    pooled[l] = {
        "min_wall": mn,
        "walls_per_batch": walls_per_batch,
        "triples_per_sec": graph_rows / mn,
    }

def eff(lo, hi):
    return (pooled[hi]["triples_per_sec"] / pooled[lo]["triples_per_sec"]) / (hi / lo)

pairs = [(levels[i], levels[i + 1]) for i in range(len(levels) - 1)]
print(json.dumps({
    "metric": "scaling_efficiency_pooled", "pages": pages, "graph_rows": graph_rows,
    "levels": {str(l): {"min_wall": round(p["min_wall"], 2),
                        "triples_per_sec": round(p["triples_per_sec"], 1)}
               for l, p in pooled.items()},
    "efficiency": {f"{lo}->{hi}": round(eff(lo, hi), 4) for lo, hi in pairs},
    "batches": len(batches),
}))

rows_md = "\n".join(
    f"| local[{l}] | {p['min_wall']:.2f} | "
    + " + ".join(str([round(w, 2) for w in ws]) for ws in p["walls_per_batch"])
    + f" | {p['triples_per_sec']:.1f} |"
    for l, p in pooled.items())
eff_md = "\n".join(
    f"- **local[{lo}] → local[{hi}]** (N vs {hi//lo}N cores): efficiency = "
    f"({pooled[hi]['triples_per_sec']:.1f} / {pooled[lo]['triples_per_sec']:.1f}) / {hi//lo} "
    f"= **{eff(lo, hi):.3f}**" for lo, hi in pairs)

md = f"""## Measured scaling (same job, multiple parallelism levels, same input)

Full KG pipeline (generate → extract → mentions → link → CC → emit →
materialize, stage snapshots + lineage on) over {pages} deterministic
synthetic pages / 20000 entities. One fresh JVM per level; inside each
JVM one warmup run then N timed repetitions, reporting the MINIMUM wall
pooled across {len(batches)} same-code batches (this sandbox VM shows
bursty CPU steal from co-tenants — the pooled min is the least-interfered
measurement). Shuffle + snapshot I/O on tmpfs (/dev/shm), standing in for
cluster-local NVMe; `local[k]` threads stand in for k executor cores
(driver instruction; no real cluster in this sandbox).

| parallelism | pooled min wall (s) | all walls (s), per batch | triples/sec |
|---|---|---|---|
{rows_md}

{eff_md}
"""
open("/root/repo/BENCH/BASELINE.md", "w").write(md)
