#!/usr/bin/env python3
"""One-off r10 correction of BENCH_x100.json after the ENOSPC incident
(see BENCH_NOTES_r10.md): the original full-suite run lost sample windows
to a full disk around ann_pq_topk / ann_ranking_metrics /
ann_rebuild_policy, and the OLD graft.Bench recorded failure-path
durations silently. All three were re-run arg-restricted on a clean disk
with the NEW error-tagging Bench (zero errors) under the exact sbt-forked
JVM config (-Xmx24g + JDK17 add-opens).

Policy: ann_pq_topk's original row is REPLACED (one of its two samples is
provably the ENOSPC failure path, and a failure-path min must not survive);
the other two rows FOLD (min of mins, max of maxes, n summed — no error
evidence in their originals, the clean re-run simply adds samples).
Headline aggregates recompute from the patched rows.

Usage: patch_bench_x100_enospc.py <clean_pq_log> <clean_pair_log>
"""
import json, math, sys

rec = json.load(open('/root/repo/BENCH_x100.json'))
q = rec['queries']


def spread_of(path):
    raw = [l for l in open(path) if '"metric":"total"' in l][0]
    b = json.loads(raw.split('[info] ', 1)[1] if '[info]' in raw else raw)
    assert not b.get('errors'), f'clean re-run has errors: {b["errors"]}'
    return b['spread']


pq = spread_of(sys.argv[1])['ann_pq_topk']
pair = spread_of(sys.argv[2])

# replace: failure-path min must not survive
q['ann_pq_topk']['x100_sec'] = round(pq['min'], 3)
q['ann_pq_topk']['x100_max_sec'] = round(pq['max'], 3)
q['ann_pq_topk']['n'] = pq['n']
# fold: clean samples join the originals
for name in ('ann_ranking_metrics', 'ann_rebuild_policy'):
    row, s = q[name], pair[name]
    row['x100_sec'] = round(min(row['x100_sec'], s['min']), 3)
    row['x100_max_sec'] = round(max(row['x100_max_sec'], s['max']), 3)
    row['n'] = row['n'] + s['n']

DEC = math.log10(100.0)
worst = (None, -9.9)
for name, row in q.items():
    base = row.get('sf0.1_sec')
    if base:
        row['ratio_x100'] = round(row['x100_sec'] / base, 2)
        row['exponent_x100'] = round(
            math.log10(max(row['x100_sec'] / base, 0.01)) / DEC, 2)
        if base > 0.3 and row['exponent_x100'] > worst[1]:
            worst = (name, row['exponent_x100'])

common = [k for k, v in q.items() if v.get('sf0.1_sec')]
x100_common = sum(q[k]['x100_sec'] for k in common)
sf01_total = sum(q[k]['sf0.1_sec'] for k in common)
total = sum(v['x100_sec'] for v in q.values())
rec['total_min_sum_sec'] = round(total, 1)
rec['cost_ratio_x100'] = round(x100_common / sf01_total, 2)
rec['aggregate_exponent_per_decade'] = round(
    math.log10(x100_common / sf01_total) / DEC, 2)
rec['enospc_correction'] = (
    'ann_pq_topk row replaced, ann_ranking_metrics/ann_rebuild_policy rows '
    'folded with clean arg-restricted re-runs after the ENOSPC incident — '
    'see BENCH_NOTES_r10.md')


def exp_of(name):
    e = q.get(name, {}).get('exponent_x100')
    return ('%s %.2f' % (name, e)) if e is not None else ('%s n/a' % name)


rec['headline'] = (
    '%d queries, %.1f s min-sum at x100 vs the sf0.1 record (%.1f s over the %d common queries) '
    '- %.1fx cost for 100x data, aggregate per-decade exponent %.2f. Worst per-decade exponent '
    'on a >0.3s base: %s at %.2f. The super-linear tail is the deliberately fixed-geometry ANN '
    'contrast gates (nCentroids=16 pinned while the query set grows with the corpus - per-query '
    'scan cost grows linearly AND |Q| grows linearly, so up to 2.0 is the naive ceiling): %s, '
    '%s, %s. Their scale-path counterparts hold at or near the 1.0 that |Q| growth alone '
    'dictates: %s, %s, %s. Three rows carry the ENOSPC correction (see enospc_correction).') % (
        len(q), total, sf01_total, len(common), x100_common / sf01_total,
        rec['aggregate_exponent_per_decade'], worst[0], worst[1],
        exp_of('ann_pq_topk'), exp_of('ann_ivfpq_rerank_p8'),
        exp_of('ann_ivfpq_topk'), exp_of('ann_auto_geometry'),
        exp_of('ann_auto_rerank'), exp_of('ingest_pipeline'))

json.dump(rec, open('/root/repo/BENCH_x100.json', 'w'), indent=1,
          sort_keys=True)
print('patched; total', rec['total_min_sum_sec'], 'agg exp',
      rec['aggregate_exponent_per_decade'], 'worst', worst)
