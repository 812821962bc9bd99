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


def norm_queries(d):
    q = d.get("queries", {})
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
    qo, do = norm_queries(old)
    qn, dn = norm_queries(new)
    print(f"old: {args[0]}  denom={do if do else 'NONE (raw s)'}  "
          f"n={len(qo)}  total={sum(old.get('queries', {}).values()):.1f}s")
    print(f"new: {args[1]}  denom={dn if dn else 'NONE (raw s)'}  "
          f"n={len(qn)}  total={sum(new.get('queries', {}).values()):.1f}s")
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
