#!/usr/bin/env python3
"""Calibration-normalized per-query work diff between two BENCH_FULL
artifacts (round-10 deliverable: VERDICT r9 item 3).

Each artifact carries a `calibration` block — a fixed 32-thread
xorshift-fill+sort micro-kernel timed (thread-CPU) before and after the
suite. Raw per-query cpu_s swings with the box regime (documented
uniform 3.7-5x inflation windows); cpu_s DIVIDED by the artifact's own
sentinel cpu_s compares across windows. `host.steal_pct_of_busy` > ~3%
marks a window whose diffs should be read with suspicion even
normalized.

Usage: cal_diff.py OLD.json NEW.json [top_n]
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    cal = d.get("calibration")
    if cal:
        # mean of pre/post: one sentinel value per artifact; a
        # non-positive sentinel is treated as absent (raw-cpu fallback)
        # rather than dividing by zero
        c = (cal["pre"]["cpu_s"] + cal["post"]["cpu_s"]) / 2.0
        if c <= 0:
            c = None
    else:
        c = None
    steal = (d.get("host") or {}).get("steal_pct_of_busy")
    qw = d.get("queries_work", {})
    return d, c, steal, qw


def main():
    old_p, new_p = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    od, oc, osteal, oqw = load(old_p)
    nd, nc, nsteal, nqw = load(new_p)
    print(f"old: {old_p}  cal_cpu={oc}  steal_pct_of_busy={osteal}")
    print(f"new: {new_p}  cal_cpu={nc}  steal_pct_of_busy={nsteal}")
    if oc is None:
        print("old artifact has no calibration block: raw-cpu fallback "
              "(pre-r10 artifact) — normalized column uses new side only")
    common = sorted(set(oqw) & set(nqw))
    rows = []
    for q in common:
        o, n = oqw[q]["cpu_s"], nqw[q]["cpu_s"]
        on = o / oc if oc else o
        nn = n / nc if nc else n
        rows.append((nn - on, q, o, n, on, nn))
    rows.sort()
    print(f"{len(common)} common queries; normalized cpu = cpu_s / cal_cpu_s")
    print(f"{'query':24s} {'old_cpu':>8s} {'new_cpu':>8s} "
          f"{'old_norm':>9s} {'new_norm':>9s} {'d_norm':>8s}")
    # head/tail slices would overlap (duplicate rows) when there are
    # fewer common queries than top_n — show everything in that case
    shown = (rows if len(rows) <= top_n
             else rows[:top_n // 2] + rows[-(top_n - top_n // 2):])
    for d, q, o, n, on, nn in shown:
        print(f"{q:24s} {o:8.2f} {n:8.2f} {on:9.4f} {nn:9.4f} {d:+8.4f}")
    tot_o = sum(oqw[q]["cpu_s"] for q in common)
    tot_n = sum(nqw[q]["cpu_s"] for q in common)
    line = (f"total cpu: old {tot_o:.1f}s new {tot_n:.1f}s")
    if oc and nc:
        line += (f"  normalized: old {tot_o / oc:.2f} new {tot_n / nc:.2f}"
                 f"  (ratio {tot_n / nc / (tot_o / oc):.3f})")
    print(line)


if __name__ == "__main__":
    main()
