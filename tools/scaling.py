"""Scaling-efficiency evidence (BASELINE.json north rule).

No real cluster exists in this sandbox, so the N -> 4N executor criterion
is evidenced by running the identical bench job at TWO CLUSTER SIZES built
from real executor JVMs on this box: ``local-cluster[E, 2, 8192]`` with
E=1 vs E=4 (each executor its own JVM, heap, GC, and Python workers --
the faithful miniature of adding executors; plain local[N] threads share
one JVM whose GC/JIT/scheduler serialize at higher N and systematically
understate cluster scaling). Throughput at both sizes plus
efficiency = (T_N / T_4N) / 4 is reported.

Set SPARK_GRAFT_SCALING_MODE=threads for the legacy local[2] vs local[8]
thread-mode pair.

Writes BENCH/BASELINE.md. Usage: python tools/scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


REPLICATE = int(os.environ.get("SPARK_GRAFT_SCALING_REPLICATE", "16"))
N_EXECUTORS = int(os.environ.get("SPARK_GRAFT_SCALING_N", "1"))
ITERS = int(os.environ.get("SPARK_GRAFT_SCALING_ITERS", "3"))
MODE = os.environ.get("SPARK_GRAFT_SCALING_MODE", "executors")


def run_bench(n: int, sf_dir: str) -> dict:
    size_args = ["--executors", str(n)] if MODE == "executors" else ["--cores", str(n)]
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *size_args,
         "--sf-dir", sf_dir, "--skip-queries", "--replicate", str(REPLICATE),
         "--iterations", str(ITERS)],
        capture_output=True, text=True, timeout=1800, cwd=REPO,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(f"bench (size {n}) produced no JSON (rc={out.returncode})\n")
        sys.stderr.write(out.stderr[-4000:] + "\n")
        raise RuntimeError("bench subprocess failed")
    return json.loads(lines[-1])


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    # synthesize the shared input once at full parallelism, then measure
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--cores", "32",
         "--sf-dir", sf_dir, "--replicate", str(REPLICATE), "--synth-only"],
        capture_output=True, text=True, timeout=1800, cwd=REPO, check=True,
    )
    r_n = run_bench(N_EXECUTORS, sf_dir)
    r_4n = run_bench(4 * N_EXECUTORS, sf_dir)
    t_n, t_4n = r_n["value"], r_4n["value"]
    speedup = t_n / t_4n
    eff = speedup / 4
    if MODE == "executors":
        label_n = f"local-cluster[{N_EXECUTORS},2,8192] ({N_EXECUTORS} executor)"
        label_4n = f"local-cluster[{4 * N_EXECUTORS},2,8192] ({4 * N_EXECUTORS} executors)"
        how = (
            f"at two cluster sizes built from REAL executor JVMs on this box\n"
            f"({N_EXECUTORS} -> {4 * N_EXECUTORS} executors, 2 cores + 8 GB each; every executor has its\n"
            "own heap, GC, and Python workers -- the faithful miniature of adding\n"
            "executors to a cluster), fresh JVMs each run:"
        )
    else:
        label_n = f"local[{N_EXECUTORS}]"
        label_4n = f"local[{4 * N_EXECUTORS}]"
        how = "at two local thread counts (single shared JVM), fresh JVM each run:"
    md = f"""# BENCH/BASELINE — scaling-efficiency evidence

North rule: throughput scaling efficiency >= 0.8 going from N to 4N
executors. Evidenced here (no real multi-node cluster in the sandbox) by
the identical end-to-end job -- pages decode -> ways⋈nodes join -> tile
pyramid + heat map + pages⋈geo -- on the same input ({REPLICATE}x-replicated
sf0.1 pages, disjoint keys; replication makes the run compute-bound rather
than scheduler-overhead-bound at this tiny scale) {how}

| cluster size | e2e sec | docs/sec | nodes/sec | tiles/sec |
|---|---|---|---|---|
| {label_n}  (N)  | {t_n:.2f} | {r_n['docs_per_sec']:.1f} | {r_n['nodes_per_sec']:.1f} | {r_n['tiles_per_sec']:.1f} |
| {label_4n} (4N) | {t_4n:.2f} | {r_4n['docs_per_sec']:.1f} | {r_4n['nodes_per_sec']:.1f} | {r_4n['tiles_per_sec']:.1f} |

- speedup N -> 4N: **{speedup:.2f}x**
- scaling efficiency = speedup / 4 = **{eff:.3f}** (target >= 0.8)
- input: {sf_dir} ({r_4n['n_docs']} docs, {r_4n['n_nodes']} nodes, {r_4n['n_tiles']} tiles)

Methodology: input materialized once at full parallelism and shared by
both runs (identical 128-file layout); per-run warmup compiles codegen and
spawns Python workers before timing; min over {ITERS} timed iterations
(contention-free estimate); shuffle + intermediates on tmpfs (local-mode
stand-in for per-executor NVMe). Executor-mode runs ship the package to
executor Python workers via PYTHONPATH on the shared filesystem (a real
cluster uses --py-files, jobs/run_pipeline.py).

Caveats: all executors still share this box's memory bandwidth and kernel;
per-stage shuffle fan-in is bounded by `spark.sql.shuffle.partitions`; at
1000 executors the same plan shapes apply with AQE coalescing. Host noise
on this sandbox is visible (repeat runs vary ~10-20% at small sizes), so
the evidence is min-over-{ITERS} within one run window.

Raw JSON:

```json
{json.dumps(r_n)}
{json.dumps(r_4n)}
```
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    notes = os.path.join(REPO, "BENCH", "NOTES.md")
    if os.path.exists(notes):
        with open(notes) as f:
            md += "\n" + f.read()
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
