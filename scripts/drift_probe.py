"""Session-level drift attribution for the bench suite (VERDICT r10
item 5): same build, repeated fresh-JVM suite-only bench sessions per
JVM/OS configuration, so the ±7% across-session spread (r10:
36.2/38.5/38.8 s) can be pinned to a lever or documented as ambient.

Levers probed (one subprocess session each, N reps per config):
  default    — the shipped get_spark flags (G1, lazy heap)
  pinned     — -Xms == -Xmx + AlwaysPreTouch: heap fully committed and
               pre-faulted at launch, removing heap-growth pauses and
               first-touch page faults from the measured window
  parallelgc — ParallelGC (throughput collector) + pinned heap: batch
               suites often prefer it over G1's pause-targeting
  dropcache  — default flags, but the page cache is dropped before the
               session, making every session uniformly COLD on file
               I/O instead of randomly warm (testdata + shuffle spill)

Each session runs `bench.py` with SPARK_GRAFT_SUITE_ONLY=1 (no
pipeline passes). Output: one JSON line per session plus a per-config
summary {min, max, spread_pct}; full records to drift_probe_out.json.

Usage: python scripts/drift_probe.py [reps_per_config] [config ...]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS: dict[str, dict] = {
    "default": {},
    "pinned": {
        "SPARK_GRAFT_DRIVER_JAVA_OPTS": "-Xms16g -XX:+AlwaysPreTouch",
    },
    "parallelgc": {
        "SPARK_GRAFT_DRIVER_JAVA_OPTS": "-XX:+UseParallelGC -Xms16g -XX:+AlwaysPreTouch",
    },
    "dropcache": {"_drop_page_cache": True},
}


def _drop_page_cache() -> bool:
    try:
        with open("/proc/sys/vm/drop_caches", "w") as fh:
            fh.write("3\n")
        return True
    except OSError:
        return False


def run_session(config: str) -> dict | None:
    spec = CONFIGS[config]
    env = dict(os.environ)
    env["SPARK_GRAFT_SUITE_ONLY"] = "1"
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for k, v in spec.items():
        if not k.startswith("_"):
            env[k] = v
    if spec.get("_drop_page_cache"):
        if not _drop_page_cache():
            print(f"# {config}: cannot drop page cache (not root?) — skipped")
            return None
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    for line in reversed(proc.stdout.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            rec = json.loads(line)
            rec["config"] = config
            return rec
    print(f"# {config}: no JSON on stdout (rc={proc.returncode})")
    print(proc.stderr[-2000:])
    return None


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    configs = sys.argv[2:] or list(CONFIGS)
    records = []
    for config in configs:
        for rep in range(reps):
            rec = run_session(config)
            if rec is None:
                break
            records.append(rec)
            print(
                json.dumps(
                    {
                        "config": config,
                        "rep": rep,
                        "value": rec["value"],
                        "calibration": rec.get("calibration"),
                    }
                )
            )
    summary = {}
    for config in configs:
        vals = [r["value"] for r in records if r["config"] == config]
        if not vals:
            continue
        mean = statistics.mean(vals)
        summary[config] = {
            "values": vals,
            "mean": round(mean, 2),
            "spread_pct": round(100 * (max(vals) - min(vals)) / mean, 2),
        }
        # regime-normalized totals (bench.run_calibration): if the
        # normalized spread is much tighter than the raw spread, the
        # variance is ambient host throughput, not the code. The
        # denominator averages the START and END probe pairs — a single
        # probe pair carries enough sampling noise to make the division
        # WORSE within a stable regime (measured r11: raw 6.5% vs
        # start-only-normalized 9.8% vs start+end-normalized 4.8%);
        # calibration exists to correct regime-SCALE shifts (>=1.3x),
        # not to polish single-digit-percent noise.
        def _denom(c: dict) -> float:
            # include the r15 pyworker probe when both records carry it
            # (older BENCH_r*.json lack it; mixing denominators across
            # sessions would skew the comparison, so require all-or-none
            # within the record itself)
            keys = ["jvm", "arrow"] + (["pyworker"] if "pyworker" in c else [])
            probes = [c[k] for k in keys]
            end_keys = [f"{k}_end" for k in keys]
            if all(k in c for k in end_keys):
                probes += [c[k] for k in end_keys]
                return sum(probes) / 2
            return sum(probes)

        norm = [
            round(r["value"] / _denom(r["calibration"]), 2)
            for r in records
            if r["config"] == config and r.get("calibration")
        ]
        if norm:
            nmean = statistics.mean(norm)
            summary[config]["normalized"] = {
                "values": norm,
                "spread_pct": round(100 * (max(norm) - min(norm)) / nmean, 2),
            }
    with open(os.path.join(ROOT, "drift_probe_out.json"), "w") as fh:
        json.dump({"summary": summary, "sessions": records}, fh, indent=1)
    print(json.dumps({"summary": summary}))


if __name__ == "__main__":
    main()
