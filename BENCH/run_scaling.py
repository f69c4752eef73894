"""Two-parallelism scaling protocol (BASELINE.md): same extraction job, same
input, at local[8] and local[32] in fresh JVMs; report turns/sec at both and
efficiency = T32 / (4 * T8). Writes BENCH/BASELINE.md.

No real multi-node cluster exists in this sandbox; per the driver
instruction this substitutes for the north rule's N vs 4N executors.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["SPARKOCR_REPO"])
cpus = int(sys.argv[1])
data = sys.argv[2]
from sparkocr.session import build_session
from sparkocr.extract.dispatch import extract_turns
from sparkocr.assemble import assemble_docs_cli

spark = build_session("scaling", master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
df = spark.read.parquet(data)
# warmup: start python workers + JIT, small slice
extract_turns(df.limit(2000)).count()
out = os.path.join(os.path.dirname(data), f"scaling_turns_{cpus}")
t0 = time.monotonic()
extract_turns(df).write.mode("overwrite").parquet(out)
t_extract = time.monotonic() - t0
n = spark.read.parquet(out).count()
t0 = time.monotonic()
n_docs = assemble_docs_cli(spark.read.parquet(out)).count()
t_assemble = time.monotonic() - t0
print(json.dumps({
    "cpus": cpus, "rows": n, "docs": n_docs,
    "extract_sec": round(t_extract, 3),
    "assemble_sec": round(t_assemble, 3),
    "turns_per_sec": round(n / t_extract, 1),
    "e2e_turns_per_sec": round(n / (t_extract + t_assemble), 1),
}))
spark.stop()
"""


def run(cpus: int, data: str) -> dict:
    env = dict(os.environ, SPARKOCR_REPO=REPO)
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), data],
        capture_output=True, text=True, env=env, check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    data = os.path.join(REPO, "data", "transcripts_bench.parquet")
    if not os.path.exists(data):
        sys.path.insert(0, REPO)
        from sparkocr.datagen import write_transcripts

        os.makedirs(os.path.dirname(data), exist_ok=True)
        write_transcripts(data, "bench")

    r8 = run(8, data)
    r32 = run(32, data)
    eff = round(r32["turns_per_sec"] / (4 * r8["turns_per_sec"]), 3)
    eff_e2e = round(r32["e2e_turns_per_sec"] / (4 * r8["e2e_turns_per_sec"]), 3)

    md = f"""# BENCH/BASELINE — two-parallelism scaling evidence

Protocol per BASELINE.md: identical input (deterministic bench-profile
transcripts, seed=42, {r8['rows']:,} turns incl. one 100k-turn skew
conversation), same DAG, fresh JVM per run, warmup action excluded from
timing. local[8] vs local[32] substitutes for N vs 4N executors (no
multi-node cluster in this sandbox, per driver instruction).

| run | cores | extract sec | turns/sec | assemble sec | e2e turns/sec |
|---|---|---|---|---|---|
| A | 8 | {r8['extract_sec']} | {r8['turns_per_sec']:,} | {r8['assemble_sec']} | {r8['e2e_turns_per_sec']:,} |
| B | 32 | {r32['extract_sec']} | {r32['turns_per_sec']:,} | {r32['assemble_sec']} | {r32['e2e_turns_per_sec']:,} |

**Scaling efficiency (extract) = T32/(4·T8) = {eff}**
**Scaling efficiency (extract+assemble) = {eff_e2e}**
Target: ≥ 0.8 (north rule).

Raw: `{json.dumps(r8)}`
`{json.dumps(r32)}`
"""
    with open(os.path.join(HERE, "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"eff_extract": eff, "eff_e2e": eff_e2e, "r8": r8, "r32": r32}))


if __name__ == "__main__":
    main()
