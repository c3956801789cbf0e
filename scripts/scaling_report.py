#!/usr/bin/env python3
"""Aggregate a directory of ClusterScalingBench JSONs into the N-vs-4N
scaling table (BENCH/BASELINE.md).

Usage: scripts/scaling_report.py bench/cluster_r5b

Files are named {N|4N}_<convs>_run<i>.json by scripts/cluster_pairs.sh.
Efficiency is computed best-of-reps per leg (min wall / max throughput),
matching the bench convention everywhere else in the repo: on a steal-prone
shared host the best rep is the least-contaminated one, and the per-run
probe_ms arrays are printed so that choice is auditable.
"""
import json
import glob
import os
import sys


def load(d):
    legs = {"N": [], "4N": []}
    for p in sorted(glob.glob(os.path.join(d, "*.json"))):
        tag = os.path.basename(p).split("_")[0]
        if tag not in legs:
            continue
        with open(p) as f:
            legs[tag].append((os.path.basename(p), json.load(f)))
    return legs


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "bench/cluster_r5b"
    legs = load(d)
    if not legs["N"] or not legs["4N"]:
        sys.exit(f"need both N_* and 4N_* JSONs in {d}")

    for tag in ("N", "4N"):
        for name, j in legs[tag]:
            probes = j.get("probe_ms", [])
            steal = (max(probes) / min(probes)) if probes else float("nan")
            print(
                f"{name}: master={j['master']} wall={j['wall_sec']:.1f}s "
                f"cpu={j['cpu_sec']:.0f}s busy={j['busy_cores']:.2f} "
                f"sections p/r/c={j.get('sec_core', j.get('sec_pairs', -1)):.0f}/"
                f"{j.get('sec_refined', -1):.0f}/{j.get('sec_clusters', -1):.0f}s "
                f"kernel={j['pairs_scored_per_sec']:.0f} "
                f"pure={j['pure_pairs_scored_per_sec']:.0f} pairs/s "
                f"probes={probes} (worst/best {steal:.2f}x)"
            )

    def best(tag, key, lo=False):
        vals = [j[key] for _, j in legs[tag] if j.get(key, -1) > 0]
        return (min if lo else max)(vals) if vals else float("nan")

    cores_n = legs["N"][0][1]["total_cores"]
    cores_4n = legs["4N"][0][1]["total_cores"]
    scale = cores_4n / cores_n

    print(f"\n== best-of-reps, {cores_n} -> {cores_4n} cores ({scale:.0f}x) ==")
    rows = [
        ("composed wall (s, lower better)", "wall_sec", True),
        ("scoring kernel (pairs/s)", "pairs_scored_per_sec", False),
        ("PURE scoring kernel (pairs/s)", "pure_pairs_scored_per_sec", False),
        ("executor CPU same work (s)", "cpu_sec", True),
    ]
    for label, key, lower in rows:
        n, x = best("N", key, lo=lower), best("4N", key, lo=lower)
        if lower:
            eff = n / x / scale if key == "wall_sec" else x / n
            note = f"efficiency {eff:.3f}" if key == "wall_sec" else f"{eff:.2f}x inflation"
        else:
            eff = x / (n * scale)
            note = f"efficiency {eff:.3f}" + (
                " — clears the >=0.8 gate" if eff >= 0.8 else " (< 0.8 gate)"
            )
        print(f"{label:35s} N={n:>10.1f}  4N={x:>10.1f}  {note}")

    # occupancy and the CPU-normalisation below pair wall and cpu FROM THE
    # SAME rep (the best-wall one): min(cpu)/min(wall) across different reps
    # would build a busy-cores figure no actual run achieved
    def best_rep(tag):
        return min((j for _, j in legs[tag]), key=lambda j: j["wall_sec"])

    for tag, cores in (("N", cores_n), ("4N", cores_4n)):
        r = best_rep(tag)
        occ = r["cpu_sec"] / r["wall_sec"] / cores
        print(f"{tag} busy-core occupancy (best-wall rep): {occ:.2f}")

    # Host-normalised composed efficiency: the shared-socket confound shows
    # up as executor-CPU inflation for IDENTICAL work (thread CPU time
    # includes memory-stall cycles). Re-price the 4N leg's wall at the N
    # leg's CPU cost and the 4N leg's own achieved occupancy — i.e. what the
    # same engine-level parallelism would deliver on hardware where adding
    # executors does not steal bandwidth from existing ones (a real
    # multi-node cluster). Printed alongside the raw number, never instead
    # of it.
    rep_n, rep_4n = best_rep("N"), best_rep("4N")
    wall_n, cpu_n = rep_n["wall_sec"], rep_n["cpu_sec"]
    wall_4n, cpu_4n = rep_4n["wall_sec"], rep_4n["cpu_sec"]
    busy_4n = cpu_4n / wall_4n
    wall_4n_norm = cpu_n / busy_4n
    print(
        f"composed raw {wall_n / wall_4n / scale:.3f}; CPU-normalised "
        f"{wall_n / wall_4n_norm / scale:.3f} "
        f"(4N wall re-priced at N CPU cost {cpu_n:.0f}s over 4N busy-cores "
        f"{busy_4n:.2f} = {wall_4n_norm:.0f}s; raw 4N CPU {cpu_4n:.0f}s = "
        f"{cpu_4n / cpu_n:.2f}x stall inflation)"
    )


if __name__ == "__main__":
    main()
