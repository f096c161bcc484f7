#!/usr/bin/env python3
"""Builds BENCH_x30.json — the FULL-SUITE x30 scale record, extending the
x10 record (BENCH_x10.json) by another half decade: every gated query run
end-to-end on the ScaleGen x30 derived dataset, per-query {min,max,n} plus
the x30/sf0.1 ratio and the per-decade exponent against the committed
sf0.1 record (bench_queries.json).

Producing commands:
  sbt "runMain graft.tools.ScaleGen /root/testdata/sf0.1 target/testdata-sf3 30"
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=target/testdata-sf3 \
    sbt "runMain graft.Bench" > /tmp/bench_x30_r9.log

Usage: mk_bench_x30.py [x30_capture [sf01_record]]
"""
import json, math, sys

PATH_X30 = sys.argv[1] if len(sys.argv) > 1 else '/tmp/bench_x30_r9.log'
PATH_B01 = sys.argv[2] if len(sys.argv) > 2 else '/root/repo/bench_queries.json'
DECADES = math.log10(30.0)

raw = [l for l in open(PATH_X30) if '"metric":"total"' in l][0]
b30 = json.loads(raw.split('[info] ', 1)[1] if '[info]' in raw else raw)
b01 = json.load(open(PATH_B01))

queries = {}
worst = (None, -9.9)
for q in sorted(b30['queries']):
    sp = b30['spread'][q]
    row = {'x30_sec': round(sp['min'], 3), 'x30_max_sec': round(sp['max'], 3),
           'n': sp['n']}
    base = b01.get(q, {}).get('min')
    if base:
        row['sf0.1_sec'] = round(base, 3)
        row['ratio_x30'] = round(sp['min'] / base, 2)
        # per-decade exponent so x10 and x30 rows compare directly:
        # 1.0 = linear in data size over the full 1.48 decades
        row['exponent_x30'] = round(
            math.log10(max(sp['min'] / base, 0.01)) / DECADES, 2)
        if base > 0.3 and row['exponent_x30'] > worst[1]:
            worst = (q, row['exponent_x30'])
    queries[q] = row

total = sum(sp['min'] for sp in b30['spread'].values())
# every derived statistic in the headline is COMPUTED from the loaded
# records (a regenerated file must not carry stale hardcoded claims):
# sf0.1 total over the common query set, cost ratio, aggregate exponent,
# and the named exponent callouts for the fixed-vs-auto ANN contrast.
common = [q for q in b30['spread'] if b01.get(q, {}).get('min')]
sf01_total = sum(b01[q]['min'] for q in common)
x30_common = sum(b30['spread'][q]['min'] for q in common)
cost_ratio = x30_common / sf01_total if sf01_total else float('nan')
agg_exp = math.log10(max(cost_ratio, 0.01)) / DECADES


def exp_of(q):
    e = queries.get(q, {}).get('exponent_x30')
    return ('%s %.2f' % (q, e)) if e is not None else ('%s n/a' % q)


out = {
 'what': ('Full-suite x30 scale record: EVERY gated query on the ScaleGen x30 derived dataset, bench '
          'protocol identical to BENCH (min-of-2, third sample on >2x disagreement, noop sink, blocking '
          'cache release, name-sorted order). ratio/exponent vs the committed sf0.1 per-query record; '
          'exponent_x30 = log10(t_x30/t_sf0.1)/log10(30), so 1.0 = linear PER DECADE and rows compare '
          'directly with BENCH_x10.json exponents. Queries under ~0.3s at sf0.1 sit on fixed job overhead '
          'and their exponents are noise, not scaling.'),
 'headline': ('%d queries, %.1f s min-sum at x30 vs the sf0.1 record (%.1f s over the %d common queries) '
              '- %.1fx cost for 30x data, aggregate per-decade exponent %.2f. Worst per-decade exponent '
              'on a >0.3s base: %s at %.2f. The super-linear tail is the deliberately fixed-geometry ANN '
              'contrast gates (nCentroids=16 pinned while the query set grows with the corpus - per-query '
              'scan cost grows linearly AND |Q| grows linearly, so up to 2.0 is the naive ceiling): %s, '
              '%s, %s. Their scale-path counterparts hold at or near the 1.0 that |Q| growth alone '
              'dictates: %s, %s, %s.') % (
               len(queries), total, sf01_total, len(common), cost_ratio,
               agg_exp, worst[0], worst[1], exp_of('ann_pq_topk'),
               exp_of('ann_ivfpq_rerank_p8'), exp_of('ann_ivfpq_topk'),
               exp_of('ann_auto_geometry'), exp_of('ann_auto_rerank'),
               exp_of('ingest_pipeline')),
 'sf01_total_common_sec': round(sf01_total, 1),
 'cost_ratio_x30': round(cost_ratio, 2),
 'aggregate_exponent_per_decade': round(agg_exp, 2),
 'setup_sec': {k: round(v, 1) for k, v in b30['setup'].items()},
 'dataset': 'target/testdata-sf3 (ScaleGen x30 of /root/testdata/sf0.1; lexically-disjoint document copies, perturbed embedding copies)',
 'total_min_sum_sec': round(total, 1),
 'queries': queries,
}
# surface per-query failures (graft.Bench tags a sample's exception in
# "errors") — an errored line's timing is the failure path, not scaling
errs = b30.get('errors') or {}
if errs:
    out['errors'] = errs
    for q in errs:
        queries.get(q, {}).pop('exponent_x30', None)
        queries.get(q, {}).pop('ratio_x30', None)
    out['headline'] += (' ERRORED at x30 (timings are failure-path, '
                        'excluded from exponents): %s.' % ', '.join(sorted(errs)))
json.dump(out, open('/root/repo/BENCH_x30.json', 'w'), indent=1, sort_keys=True)
print('written', len(queries), 'rows; total', round(total, 1), 's; worst', worst)
