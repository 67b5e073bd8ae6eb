"""Two-parallelism scaling evidence (BASELINE.md protocol).

No real cluster exists in this sandbox, so the N→4N executor criterion is
evidenced by running the SAME crawl job on the SAME input at local[8] and
local[32] via ``spark-submit --py-files`` and reporting both throughputs +
efficiency = (thr32/thr8)/4 into BENCH.md. The job is sized compute-bound
(mass absorb + fetch + Arrow validation) so parallelism, not fixed epoch
latency, dominates.

Usage: python tools/bench_scaling.py [--quick]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# compute-bound sizing: large seed batch + generous politeness so each epoch
# carries ~10^5 grants through canonicalize/hash/anti-join/rank/fetch/validate
SCALING_ENV = {
    "MAGA_BENCH_URLS": "1000000",
    "MAGA_BENCH_EPOCHS": "1",
    "MAGA_BENCH_GLOBAL_K": "400000",
    "MAGA_BENCH_RATE_BOOST": "256",
    "MAGA_BENCH_SEEDS": "600000",
    "MAGA_BENCH_IMG_SIZES": "48,64,96",
    "MAGA_BENCH_CRAWL_ONLY": "1",
}


def make_pyfiles_zip() -> str:
    zpath = os.path.join(REPO, ".bench_cache", "maga_spark_pyfiles.zip")
    os.makedirs(os.path.dirname(zpath), exist_ok=True)
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "maga_spark")):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
        z.write(os.path.join(REPO, "__spark_entry__.py"), "__spark_entry__.py")
    return zpath


def run_one(cpus: int, zpath: str, env_extra: dict) -> dict:
    env = dict(os.environ)
    env.update(env_extra)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["PYTHONPATH"] = REPO
    cmd = [
        "spark-submit",
        "--master",
        f"local[{cpus}]",
        "--driver-memory",
        "24g",
        "--conf",
        f"spark.sql.shuffle.partitions={max(8, cpus * 2)}",
        "--py-files",
        zpath,
        os.path.join(REPO, "bench.py"),
    ]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=1800)
    for line in reversed(out.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no JSON from local[{cpus}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    env_extra = dict(SCALING_ENV)
    if "--quick" in sys.argv:
        env_extra.update(
            {"MAGA_BENCH_URLS": "150000", "MAGA_BENCH_GLOBAL_K": "40000", "MAGA_BENCH_SEEDS": "30000"}
        )
    zpath = make_pyfiles_zip()
    # warm the fixture cache once (generation is single-process python)
    env = dict(os.environ)
    env.update(env_extra)
    env["PYTHONPATH"] = REPO
    subprocess.run(
        [
            sys.executable,
            "-c",
            "import os,sys; sys.path.insert(0, os.environ['PYTHONPATH']);"
            "import bench; bench.bench_fixture_dir(int(os.environ['MAGA_BENCH_URLS']))",
        ],
        env=env,
        check=True,
        timeout=1800,
    )

    r8 = run_one(8, zpath, env_extra)
    r32 = run_one(32, zpath, env_extra)
    thr8, thr32 = r8["value"], r32["value"]
    eff = (thr32 / thr8) / 4

    md = f"""# BENCH — scaling evidence (N vs 4N, sandbox proxy)

Protocol (BASELINE.md): the same crawl job on the same input, run via
`spark-submit --py-files` at two parallelism levels.

Job: crawl engine, {env_extra['MAGA_BENCH_URLS']} URL universe,
{env_extra['MAGA_BENCH_EPOCHS']} epochs, global_k={env_extra['MAGA_BENCH_GLOBAL_K']},
rate_boost={env_extra['MAGA_BENCH_RATE_BOOST']}, seeds={env_extra.get('MAGA_BENCH_SEEDS')}.
Shuffle partitions scale with cores (16 / 64).

| run | master | URLs scheduled+fetched | wall (s) | throughput (urls/s) |
| --- | --- | --- | --- | --- |
| A | local[8]  | {r8['scheduled'] + r8['fetched_valid']} | {r8['queries']['crawl_frontier']} | {thr8} |
| B | local[32] | {r32['scheduled'] + r32['fetched_valid']} | {r32['queries']['crawl_frontier']} | {thr32} |

**Scaling efficiency = (thr₃₂ / thr₈) / 4 = {eff:.3f}** (target ≥ 0.8 per BASELINE.json).
"""
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
