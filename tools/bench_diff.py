#!/usr/bin/env python3
"""Round-over-round bench comparator on PROBE-NORMALIZED columns
(VERDICT r10 #7): diff two BENCH_FULL-style artifacts so per-query
deltas are box-speed-free.

  python3 tools/bench_diff.py OLD.json NEW.json [--top N]

Denominator discipline: r10+ artifacts carry `probe_median_sec`
(median of ALL probe samples) and per-query `queries_probe_norm`.
Pre-r10 artifacts normalized by the endpoint MEAN — for those this
script RE-DERIVES the median-of-all-samples denominator from
probe_start_sec / probe_end_sec / probe_timeline, so both sides of
the diff always share a definition (see BENCH_NOTES "Denominator
change (r10+)").

r12+ artifacts additionally carry:
  - `probe_io_*_sec` (32 MB write+fsync+read leg): reported alongside
    the CPU probe so I/O-family inflation is adjudicable from the
    artifact (a slow write-path query against a flat io-probe is code,
    against a spiking one is the disk).
  - `memo_builds` / `queries_memo_sec`: one-time shared-infra builds
    charged to explicit lines; `queries` is operator-cost-only. When
    diffing an r12+ artifact against an older one, the older side's
    query walls still INCLUDE first-build memo costs — the comparator
    adds the new side's memo seconds back onto its query lines so the
    comparison stays wall-vs-wall.
"""
import json
import statistics
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def denom(d):
    """Median of all probe samples, re-derived when absent."""
    if d.get("probe_median_sec"):
        return d["probe_median_sec"]
    samples = []
    for k in ("probe_start_sec", "probe_end_sec"):
        if d.get(k):
            samples.append(d[k])
    for t in d.get("probe_timeline", []):
        if isinstance(t, dict) and t.get("sec"):
            samples.append(t["sec"])
        elif isinstance(t, (int, float)):
            samples.append(t)
    return statistics.median(samples) if samples else None


def io_denom(d):
    """Median of I/O-probe samples (r12+), or None."""
    if d.get("probe_io_median_sec"):
        return d["probe_io_median_sec"]
    samples = [d[k] for k in ("probe_io_start_sec", "probe_io_end_sec")
               if d.get(k)]
    samples += [t["io_sec"] for t in d.get("probe_timeline", [])
                if isinstance(t, dict) and t.get("io_sec")]
    return statistics.median(samples) if samples else None


def walls(d, add_memo):
    """Per-query WALL seconds. r12+ `queries` is operator-only; when
    comparing against a pre-r12 artifact (whose walls include memo
    builds) the memo seconds are added back for a wall-vs-wall diff."""
    q = dict(d.get("queries", {}))
    if add_memo:
        for k, m in d.get("queries_memo_sec", {}).items():
            if k in q:
                q[k] += m
    return q


def norm_queries(d, add_memo=False):
    q = walls(d, add_memo)
    dn = denom(d)
    if dn:
        return {k: v / dn for k, v in q.items()}, dn
    # no probes at all (pre-r7 artifact): raw seconds, flagged
    return dict(q), None


def main():
    argv = sys.argv[1:]
    top = 20
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    args = argv
    if len(args) != 2:
        sys.exit(__doc__)
    old, new = load(args[0]), load(args[1])
    # memo-aware wall reconstruction: only when exactly one side carries
    # the r12+ operator-only split does the split side need its memo
    # seconds added back; two r12+ artifacts compare operator-only.
    o_has, n_has = "queries_memo_sec" in old, "queries_memo_sec" in new
    qo, do = norm_queries(old, add_memo=o_has and not n_has)
    qn, dn = norm_queries(new, add_memo=n_has and not o_has)
    # Header totals use the SAME memo-aware wall reconstruction as the
    # normalized diff: raw sums would print operator-only seconds for
    # r12+ artifacts next to wall seconds for pre-r12 ones — not
    # comparable across the format split.
    wall_o = sum(walls(old, add_memo=o_has and not n_has).values())
    wall_n = sum(walls(new, add_memo=n_has and not o_has).values())
    print(f"old: {args[0]}  denom={do if do else 'NONE (raw s)'}  "
          f"n={len(qo)}  total={wall_o:.1f}s")
    print(f"new: {args[1]}  denom={dn if dn else 'NONE (raw s)'}  "
          f"n={len(qn)}  total={wall_n:.1f}s")
    if o_has and n_has:
        print("(totals are operator-only on both sides; memo_builds "
              "listed separately below)")
    io_o, io_n = io_denom(old), io_denom(new)
    if io_o or io_n:
        print(f"io probe (32MB write+fsync+read): "
              f"{io_o if io_o else 'n/a'} -> {io_n if io_n else 'n/a'} s")
    for side, d in (("old", old), ("new", new)):
        mb = d.get("memo_builds", {})
        if mb:
            tot = sum(v.get("sec", 0) for v in mb.values())
            tops = sorted(mb.items(), key=lambda kv: -kv[1].get("sec", 0))[:5]
            print(f"{side} memo_builds: {len(mb)} entries, {tot:.1f}s total; "
                  "top: " + ", ".join(
                      f"{k.split('|')[0]}={v['sec']:.1f}s@{v.get('during','?')}"
                      for k, v in tops))
    to, tn = sum(qo.values()), sum(qn.values())
    unit = "probe-units" if (do and dn) else "MIXED/RAW — do not compare"
    print(f"normalized totals ({unit}): {to:.1f} -> {tn:.1f} "
          f"({(tn - to) / to * 100 if to else 0:+.1f}%)")
    both = sorted(set(qo) & set(qn),
                  key=lambda k: -(abs(qn[k] - qo[k])))
    print(f"\ntop {top} per-query deltas (normalized units, |delta| desc):")
    print(f"{'query':<28}{'old':>9}{'new':>9}{'delta':>9}{'ratio':>7}")
    for k in both[:top]:
        r = qn[k] / qo[k] if qo[k] else float("inf")
        print(f"{k:<28}{qo[k]:>9.2f}{qn[k]:>9.2f}"
              f"{qn[k] - qo[k]:>+9.2f}{r:>7.2f}")
    gone, added = sorted(set(qo) - set(qn)), sorted(set(qn) - set(qo))
    if gone:
        print(f"\nremoved: {', '.join(gone)}")
    if added:
        print(f"added:   {', '.join(added)}")


if __name__ == "__main__":
    main()
