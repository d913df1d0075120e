"""N vs 4N *executor* scaling evidence via Spark's local-cluster mode.

local-cluster[E,C,M] launches E real separate executor JVMs with C cores
and M MiB each — unlike local[N] (single JVM), this exercises the actual
multi-executor machinery: the package zip shipped via addPyFile
(spark-submit --py-files equivalent), per-executor Python worker pools,
and network shuffle between JVMs.  The pair is 1 executor vs 4 executors
at 4 cores each (4 vs 16 busy cores — inside this host's linear range,
see the calibration in BENCH.md).

Usage: python tools/bench_cluster.py [replicate]   (default 400 ~ 2M docs)
Appends its section to BENCH.md (run tools/bench_scaling.py first — it
rewrites the file).
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

RUN_SNIPPET = r"""
import json, sys, time
sys.path.insert(0, "{repo}")
from warc2text_spark.session import get_spark
from warc2text_spark.plans.pipeline import PipelineOptions, run_pipeline, demux_by_lang

n_exec = int(sys.argv[1])
corpus = sys.argv[2]
master = f"local-cluster[{{n_exec}},4,6144]"
spark = get_spark("cluster-scaling", master=master,
                  shuffle_partitions=n_exec * 4,
                  extra_conf={{"spark.driver.memory": "8g"}})
spark.sparkContext.setLogLevel("ERROR")
spans = spark.read.parquet(corpus)
n = spans.count()
warm = run_pipeline(spans.limit(4000).repartition(n_exec * 4),
                    PipelineOptions(classifier="heuristic"))
warm.main.write.format("noop").mode("overwrite").save()
t0 = time.perf_counter()
res = run_pipeline(spans, PipelineOptions(classifier="heuristic"))
demux_by_lang(res.main).write.format("noop").mode("overwrite").save()
dt = time.perf_counter() - t0
print(json.dumps({{"executors": n_exec, "n_docs": n, "seconds": round(dt, 2),
                   "docs_per_sec": round(n / dt, 1)}}))
spark.stop()
"""


def run_level(n_exec: int, corpus: str, repeat: int = 2) -> dict:
    best = None
    for _ in range(repeat):
        out = subprocess.run(
            [sys.executable, "-c", RUN_SNIPPET.format(repo=REPO),
             str(n_exec), corpus],
            capture_output=True, text=True, timeout=3600, cwd="/tmp")
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not lines:
            raise RuntimeError(out.stderr[-2000:])
        r = json.loads(lines[-1])
        if best is None or r["docs_per_sec"] > best["docs_per_sec"]:
            best = r
    return best


def main() -> None:
    replicate = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    sys.path.insert(0, str(REPO / "tools"))
    sys.path.insert(0, str(REPO))
    from bench_scaling import build_corpus  # same cached corpus
    corpus = build_corpus(replicate)
    one = run_level(1, corpus)
    four = run_level(4, corpus)
    eff = (four["docs_per_sec"] / one["docs_per_sec"]) / 4
    result = {"one_executor": one, "four_executors": four,
              "efficiency_1_to_4_executors": round(eff, 3)}
    print(json.dumps(result))

    section = f"""
## N vs 4N executors (local-cluster: real separate executor JVMs)

Same job, same input, run under ``local-cluster[E,4,6144]`` — E isolated
executor JVMs x 4 cores, package shipped to executors via the
--py-files-equivalent zip, shuffle crossing JVM boundaries:

| executors | docs | seconds | docs/sec |
|---|---|---|---|
| 1 x 4 cores | {one['n_docs']:,} | {one['seconds']} | {one['docs_per_sec']:,.0f} |
| 4 x 4 cores | {four['n_docs']:,} | {four['seconds']} | {four['docs_per_sec']:,.0f} |

**Executor-scaling efficiency 1 -> 4 executors: {eff:.3f}** (north_rule
criterion >= 0.8; the pair sits at 4 vs 16 busy cores, inside this host's
linear range).
"""
    with open(REPO / "BENCH.md", "a") as fh:
        fh.write(section)
    print("appended to BENCH.md")


if __name__ == "__main__":
    main()
