#!/usr/bin/env python3
"""Canary-normalized round-over-round bench comparison.

Usage: bench_compare.py <old_bench.json> <new_bench.json> [threshold]

Each graft.Bench artifact carries, per query, its median seconds
(`queries`) and the canary reading taken nearest to it in the sweep
(`canary_ref`) — the same tiny query re-timed throughout the run, so it
prices the host's momentary capacity at that point. Dividing the median
by its canary_ref turns "seconds on whatever this host was doing" into
"multiples of the canary at that moment": two rounds that ran under
different background load divide the load out, and what remains is the
plan's real movement.

Reports every shared query whose normalized ratio (new/old) exceeds the
threshold (default 1.3) either way, plus the normalized totals. Queries
flagged contaminated in either artifact are listed but excluded from
the verdict line — their brackets carry known inflation.

A median-based flag must ALSO reproduce on the per-rep MINIMA before it
counts as a clean regression: the minimum of 3 reps is the least
contention-inflatable statistic each artifact carries, so a "regression"
whose minima ratio is inside the threshold is one or two contended reps
skewing a median, not a plan change (round 14: five median-flagged
regressions up to 2.44x all evaporated on a clean re-run; every one had
minima inside threshold). Such flags are reported as SUSPECT, not
counted in the verdict.

CANARY DRIFT: normalization only divides load out if the canary priced
the same machine state in both artifacts. When the canary FLOOR itself
moved more than CANARY_DRIFT between the runs (round 15: a clean run's
canary came in ~30% under a noisier prior run, inflating every
normalized ratio by exactly that factor), canary-units from the two
artifacts are not the same unit. Under drift a flag must ALSO reproduce
on RAW medians past the threshold: a true plan regression shows in both
scales; a canary-level shift shows only in the normalized one; a whole-
host slowdown shows only in the raw one. Flags failing the raw gate are
reported CANARY-DRIFT and excluded from the verdict.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.loads(f.read().strip())


def normalized(artifact):
    qs = artifact.get("queries", {})
    refs = artifact.get("canary_ref", {})
    out = {}
    for name, sec in qs.items():
        ref = refs.get(name, 0.0)
        if sec and sec > 0 and ref and ref > 0:
            out[name] = sec / ref
    return out


def normalized_minima(artifact):
    """Per-query min-of-reps, canary-normalized; {} if no raw reps."""
    raw = artifact.get("raw", {})
    refs = artifact.get("canary_ref", {})
    out = {}
    for name, reps in raw.items():
        ref = refs.get(name, 0.0)
        ts = [t for t in (reps or []) if t and t > 0]
        if ts and ref and ref > 0:
            out[name] = min(ts) / ref
    return out


def raw_minima(artifact):
    """Per-query min-of-reps in raw seconds; {} if no raw reps."""
    out = {}
    for name, reps in artifact.get("raw", {}).items():
        ts = [t for t in (reps or []) if t and t > 0]
        if ts:
            out[name] = min(ts)
    return out


CANARY_DRIFT = 1.2


def canary_floor(artifact):
    """The cleanest canary reading of the run — its capacity price."""
    series = artifact.get("canary", {}).get("series", [])
    secs = [p.get("sec", 0.0) for p in series if p.get("sec", 0.0) > 0]
    return min(secs) if secs else 0.0


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    old, new = load(old_path), load(new_path)
    n_old, n_new = normalized(old), normalized(new)
    dirty = set(old.get("canary", {}).get("contaminated_queries", [])) | \
        set(new.get("canary", {}).get("contaminated_queries", []))
    # two-pass artifacts self-compare: a query whose pass medians
    # disagreed >1.5x on identical code within ONE run is host noise by
    # construction — exclude it from the verdict like contamination
    self_noise = set(old.get("self_compare", {}).get("noise", [])) | \
        set(new.get("self_compare", {}).get("noise", []))
    shared = sorted(set(n_old) & set(n_new))
    if not shared:
        print("no shared canary-normalized queries (old artifact predates "
              "canary_ref?) — falling back to raw medians")
        n_old = {k: v for k, v in old.get("queries", {}).items() if v > 0}
        n_new = {k: v for k, v in new.get("queries", {}).items() if v > 0}
        shared = sorted(set(n_old) & set(n_new))
    m_old, m_new = normalized_minima(old), normalized_minima(new)
    rm_old, rm_new = raw_minima(old), raw_minima(new)
    cf_old, cf_new = canary_floor(old), canary_floor(new)
    drift = (cf_old > 0 and cf_new > 0 and
             (cf_old / cf_new > CANARY_DRIFT or cf_new / cf_old > CANARY_DRIFT))
    if drift:
        print(f"canary floor moved {cf_old:.3f}s -> {cf_new:.3f}s "
              f"(ratio {cf_new / cf_old:.2f}): artifacts price capacity in "
              "different canary-units — flags must also reproduce on RAW "
              "medians")
    raw_old = old.get("queries", {})
    raw_new = new.get("queries", {})
    moved = []
    for name in shared:
        r = n_new[name] / n_old[name] if n_old[name] > 0 else float("inf")
        tag = " CONTAMINATED" if name in dirty else ""
        if not tag and name in self_noise:
            tag = " SELF-NOISE (pass medians disagreed within one run)"
        # second gate: a median regression whose per-rep minima did not
        # move past the threshold is contention noise, not a plan change
        if (not tag and r > threshold and name in m_old and name in m_new
                and m_old[name] > 0
                and m_new[name] / m_old[name] <= threshold):
            tag = (" SUSPECT (minima ratio "
                   f"{m_new[name] / m_old[name]:.2f} inside threshold)")
        # noise gate: a real plan regression raises the floor of EVERY
        # rep in raw seconds; a slow canary bracket on an internally-
        # variable host (floors matched between artifacts, spread high
        # within a run) inflates normalized ratios while raw minima sit
        # still — the r15 shape where back-to-back runs each flagged a
        # different random set of queries
        if (not tag and r > threshold and name in rm_old and name in rm_new
                and rm_old[name] > 0
                and rm_new[name] / rm_old[name] <= threshold):
            tag = (" HOST-NOISE (raw minima ratio "
                   f"{rm_new[name] / rm_old[name]:.2f} inside threshold)")
        # drift gate: under canary drift the normalization baseline is
        # incomparable — a clean regression must show in raw seconds too
        if (not tag and r > threshold and drift
                and raw_old.get(name, 0) > 0
                and raw_new.get(name, 0) / raw_old[name] <= threshold):
            tag = (" CANARY-DRIFT (raw ratio "
                   f"{raw_new.get(name, 0) / raw_old[name]:.2f} inside "
                   "threshold)")
        if r > threshold or r < 1.0 / threshold:
            moved.append((r, name, tag))
    for r, name, tag in sorted(moved, reverse=True):
        print(f"{'REGRESSED' if r > 1 else 'improved '} {name}: "
              f"{n_old[name]:.2f}x -> {n_new[name]:.2f}x canary "
              f"(ratio {r:.2f}){tag}")
    clean = [(r, name) for r, name, tag in moved if not tag and r > threshold]
    tot_old = sum(n_old[q] for q in shared)
    tot_new = sum(n_new[q] for q in shared)
    print(f"normalized totals over {len(shared)} shared queries: "
          f"{tot_old:.1f} -> {tot_new:.1f} canary-units "
          f"(ratio {tot_new / tot_old if tot_old else 0:.2f})")
    if clean:
        print(f"VERDICT: {len(clean)} clean regression(s) past {threshold}x")
        sys.exit(1)
    print("VERDICT: no clean regressions")


if __name__ == "__main__":
    main()
