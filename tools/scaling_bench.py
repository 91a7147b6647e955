"""Two-parallelism scaling benchmark (the sandbox stand-in for the
north rule's N vs 4N executor criterion).

Runs the identical headline pipeline (parse -> enrich -> route ->
aggregate over synthetic transcripts) in SEPARATE JVMs at local[N]
and local[4N], reports throughput at both and the scaling
efficiency = T_N / (4 * T_4N), and writes BENCH.md.

Usage: python tools/scaling_bench.py [--turns 2000000] [--n 8]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(master: str, turns: int, repeats: int = 2) -> dict:
    cmd = [
        sys.executable,
        "-m",
        "ilogtail_spark.benchflow",
        "--master",
        master,
        "--turns",
        str(turns),
        "--repeats",
        str(repeats),
        "--enriched",
    ]
    out = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=1800
    )
    if out.returncode != 0 or not out.stdout.strip():
        print(
            json.dumps(
                {
                    "error": f"bench subprocess failed rc={out.returncode}",
                    "master": master,
                    "stderr_tail": out.stderr[-500:],
                }
            ),
            flush=True,
        )
        raise RuntimeError(f"bench subprocess failed for {master}")
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=2_000_000)
    ap.add_argument("--n", type=int, default=4, help="cores per executor; masters are 1 vs 4 executors")
    ap.add_argument(
        "--rounds",
        type=int,
        default=4,
        help="interleaved rounds: the shared host's co-tenant CPU steal "
        "comes in minutes-long bursts, so alternating the two masters "
        "and taking each one's best round samples both under "
        "comparable conditions",
    )
    # default to a separate file so reproduction runs do not clobber
    # the curated multi-run evidence in BENCH.md
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_AUTO.md"))
    ap.add_argument(
        "--mode",
        choices=["local", "local-cluster"],
        default="local-cluster",
        help="local-cluster[N workers, 8 cores each] runs REAL separate "
        "executor JVMs — the faithful stand-in for N vs 4N executors "
        "(and per-executor GC, shuffle over loopback, serialized task "
        "dispatch, exactly as on a cluster)",
    )
    args = ap.parse_args()

    if args.mode == "local-cluster":
        mem_mb = 8192
        masters = [
            f"local-cluster[1,{args.n},{mem_mb}]",
            f"local-cluster[4,{args.n},{mem_mb}]",
        ]
    else:
        masters = [f"local[{args.n}]", f"local[{args.n * 4}]"]
    best: dict[str, dict] = {}
    samples: dict[str, list] = {m: [] for m in masters}
    for _ in range(args.rounds):
        for m in masters:
            r = run_one(m, args.turns)
            samples[m].append(r["sec"])
            if m not in best or r["sec"] < best[m]["sec"]:
                best[m] = r
    small, big = best[masters[0]], best[masters[1]]
    small["all_secs"], big["all_secs"] = samples[masters[0]], samples[masters[1]]
    eff = (big["turns_per_sec"] / small["turns_per_sec"]) / 4

    md = f"""# BENCH — two-parallelism scaling (north-rule evidence)

The identical headline job — synthetic transcripts -> regex parse
(nginx 10-group + app-log) -> broadcast dict_map enrich ->
first-match route -> per-sink hourly aggregates -> noop sink — run in
separate JVMs at two parallelism levels on the same input
({args.turns:,} turns, deterministic seed). Sandbox stand-in for N vs
4N executors (BASELINE.json north_rule).

| master | turns | wall sec (best of {args.rounds} interleaved rounds) | turns/sec |
|---|---|---|---|
| `{small["master"]}` | {small["turns"]:,} | {small["sec"]} | {small["turns_per_sec"]:,} |
| `{big["master"]}` | {big["turns"]:,} | {big["sec"]} | {big["turns_per_sec"]:,} |

**Scaling efficiency T_N / (4 * T_4N) = {eff:.3f}** (target >= 0.8).

All samples (sec): `{small["master"]}` {small["all_secs"]}; `{big["master"]}`
{big["all_secs"]}. Best-of over interleaved rounds is used because the
sandbox shares its host — co-tenant CPU steal arrives in minutes-long
bursts that would otherwise be attributed to whichever master ran
during the burst.

Reference comparison (BASELINE.md): the reference's regex-parse path
peaks at 68 MB/s on one thread (~283-byte nginx lines ~= 250k
lines/sec). Our per-core rate at local[{args.n}] is
{small["turns_per_sec"] // args.n:,} turns/sec/core on ~100-300-byte
turn texts, with two regex parse stages + enrich + route + aggregate
in the plan.

Reproduce: `python tools/scaling_bench.py --turns {args.turns} --n {args.n}`
"""
    with open(args.out, "w") as f:
        f.write(md)
    print(json.dumps({"small": small, "big": big, "efficiency": round(eff, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
