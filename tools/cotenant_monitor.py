"""Co-tenant CPU monitor: attribute system CPU to OUR process tree vs
everything else.

The 1-minute loadavg cannot distinguish the bench's own local[32] burst
from a co-tenant burst — which is why every BENCH_FULL anchor to date
self-flagged contaminated. This monitor samples /proc/stat (total busy
jiffies across all CPUs) and the utime+stime of a target process tree
(default: every process owned by this user whose cmdline mentions
bench.py or java), and logs the DIFFERENCE — CPU burned by OTHER
processes — per window. "Clean run" = other-CPU stays under a fraction
of one core on average.

Usage: python tools/cotenant_monitor.py [--interval 10] [--out FILE]
Stops when the watched tree disappears (or on Ctrl-C); writes one JSON
line per window plus a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HZ = os.sysconf("SC_CLK_TCK")


def total_busy_jiffies() -> int:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    # user nice system idle iowait irq softirq steal
    vals = [int(x) for x in parts[1:9]]
    return sum(vals) - vals[3] - vals[4]  # exclude idle + iowait


def _cmdline(pid: str) -> str:
    try:
        with open(f"/proc/{pid}/cmdline", "rb") as fh:
            return fh.read().replace(b"\0", b" ").decode(errors="replace")
    except OSError:
        return ""


def tree_pids(markers: list[str]) -> set[str]:
    out = set()
    me = str(os.getpid())
    for pid in os.listdir("/proc"):
        if not pid.isdigit() or pid == me:
            continue
        cmd = _cmdline(pid)
        if any(m in cmd for m in markers):
            out.add(pid)
    return out


def tree_cpu_jiffies(pids: set[str]) -> int:
    tot = 0
    for pid in pids:
        try:
            with open(f"/proc/{pid}/stat") as fh:
                f = fh.read().rsplit(")", 1)[1].split()
            # utime+stime plus cutime+cstime: reaped children's CPU
            # migrates to the parent at reap — counting it keeps worker
            # pool shrinks from reading as phantom co-tenant bursts
            tot += int(f[11]) + int(f[12]) + int(f[13]) + int(f[14])
        except (OSError, IndexError):
            pass
    return tot


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=10.0)
    ap.add_argument("--out", default="/tmp/cotenant_monitor.jsonl")
    ap.add_argument(
        "--markers",
        default="bench.py,java,pyspark.daemon,pyspark.worker",
        help="comma-separated cmdline substrings identifying OUR tree",
    )
    ap.add_argument(
        "--max-minutes", type=float, default=120.0,
        help="hard stop",
    )
    args = ap.parse_args()
    markers = [m for m in args.markers.split(",") if m]

    ncpu = os.cpu_count() or 1
    windows = []
    t_end = time.time() + args.max_minutes * 60
    prev_busy = total_busy_jiffies()
    pids = tree_pids(markers)
    prev_tree = tree_cpu_jiffies(pids)
    misses = 0
    with open(args.out, "w") as fh:
        while time.time() < t_end:
            time.sleep(args.interval)
            pids = tree_pids(markers)
            if not pids:
                misses += 1
                if misses >= 3:
                    break
            else:
                misses = 0
            busy = total_busy_jiffies()
            tree = tree_cpu_jiffies(pids)
            d_busy = max(busy - prev_busy, 0)
            # tree CPU can shrink when a JVM exits (its jiffies vanish);
            # clamp the delta at 0 and at d_busy
            d_tree = min(max(tree - prev_tree, 0), d_busy)
            other_cores = (d_busy - d_tree) / HZ / args.interval
            w = {
                "t": round(time.time(), 1),
                "other_cores_avg": round(other_cores, 3),
                "tree_cores_avg": round(d_tree / HZ / args.interval, 3),
                "load_1m": round(os.getloadavg()[0], 2),
                "n_tree_pids": len(pids),
            }
            windows.append(w)
            fh.write(json.dumps(w) + "\n")
            fh.flush()
            prev_busy, prev_tree = busy, tree
    if windows:
        others = [w["other_cores_avg"] for w in windows]
        summary = {
            "summary": True,
            "n_windows": len(windows),
            "other_cores_mean": round(sum(others) / len(others), 3),
            "other_cores_max": round(max(others), 3),
            "ncpu": ncpu,
        }
        with open(args.out, "a") as fh:
            fh.write(json.dumps(summary) + "\n")
        print(json.dumps(summary))


if __name__ == "__main__":
    main()
