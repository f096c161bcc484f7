#!/usr/bin/env python3
"""Shared builder for the BENCH_x{10,30,100}.json scale records.

FOLD-PRESERVING by construction (VERDICT r10 task 1c): the existing
record on disk is always folded in as a source, so regenerating a record
from one run's log can never drop rows that earlier runs or appends
contributed — the exact clobber-class bug graft.Bench's ledger fold
fixed in round 10, which the per-record tooling then reintroduced
(the x30 regeneration silently dropped 13 appended lifecycle rows).

Sources may be either:
  - a graft.Bench stdout capture (the line containing '"metric":"total"'), or
  - a previously-written BENCH_x*.json record (auto-detected).

Per-query fold: min of mins, max of maxes, n summed. A query tagged in a
source's "errors" contributes NO timing from that source (failure-path
durations are not scaling data); its error note survives only if no
source supplies a clean timing. Setup floats fold by min. All derived
statistics (ratios, exponents, headline) are recomputed from the folded
map against the current sf0.1 ledger.
"""
import json
import math
import os


def _parse_source(path, label):
    """Returns (queries {q: (mn, mx, n)}, setup {k: sec}, errors {q: msg})."""
    text = open(path).read()
    log_lines = [l for l in text.splitlines() if '"metric":"total"' in l]
    if log_lines:
        raw = log_lines[0]
        b = json.loads(raw.split('[info] ', 1)[1] if '[info]' in raw else raw)
        errors = b.get('errors') or {}
        queries = {q: (sp['min'], sp['max'], sp['n'])
                   for q, sp in b['spread'].items() if q not in errors}
        return queries, dict(b.get('setup') or {}), dict(errors)
    rec = json.loads(text)
    errors = dict(rec.get('errors') or {})
    queries = {}
    for q, row in rec.get('queries', {}).items():
        if q in errors:
            continue
        mn = row.get('%s_sec' % label)
        if mn is None:
            continue
        queries[q] = (mn, row.get('%s_max_sec' % label, mn), row.get('n', 1))
    return queries, dict(rec.get('setup_sec') or {}), errors


def fold_sources(paths, label):
    merged, setup, errors = {}, {}, {}
    for p in paths:
        qs, st, er = _parse_source(p, label)
        for q, (mn, mx, n) in qs.items():
            if q in merged:
                pmn, pmx, pn = merged[q]
                merged[q] = (min(pmn, mn), max(pmx, mx), pn + n)
            else:
                merged[q] = (mn, mx, n)
        for k, v in st.items():
            setup[k] = min(setup[k], v) if k in setup else v
        errors.update(er)
    # an error note survives only while NO source has a clean timing
    errors = {q: m for q, m in errors.items() if q not in merged}
    return merged, setup, errors


def build(scale, out_path, sources, sf01_record, dataset_desc,
          what_extra='', headline_extra=''):
    label = 'x%d' % scale
    decades = math.log10(float(scale))
    # the existing record is ALWAYS the first source: regeneration folds,
    # never clobbers
    paths = ([out_path] if os.path.exists(out_path) else []) + list(sources)
    merged, setup, errors = fold_sources(paths, label)
    b01 = json.load(open(sf01_record))

    queries = {}
    worst = (None, -9.9)
    for q in sorted(merged):
        mn, mx, n = merged[q]
        row = {'%s_sec' % label: round(mn, 3),
               '%s_max_sec' % label: round(mx, 3), 'n': n}
        base = b01.get(q, {}).get('min')
        if base:
            row['sf0.1_sec'] = round(base, 3)
            row['ratio_%s' % label] = round(mn / base, 2)
            # per-decade exponent so x10/x30/x100 rows compare directly:
            # 1.0 = linear in data size
            row['exponent_%s' % label] = round(
                math.log10(max(mn / base, 0.01)) / decades, 2)
            if base > 0.3 and row['exponent_%s' % label] > worst[1]:
                worst = (q, row['exponent_%s' % label])
        queries[q] = row

    total = sum(mn for mn, _, _ in merged.values())
    common = [q for q in merged if b01.get(q, {}).get('min')]
    sf01_total = sum(b01[q]['min'] for q in common)
    x_common = sum(merged[q][0] for q in common)
    cost_ratio = x_common / sf01_total if sf01_total else float('nan')
    agg_exp = math.log10(max(cost_ratio, 0.01)) / decades

    def exp_of(q):
        e = queries.get(q, {}).get('exponent_%s' % label)
        return ('%s %.2f' % (q, e)) if e is not None else ('%s n/a' % q)

    out = {
        'what': (('Full-suite %s scale record: EVERY gated query on the ScaleGen %s derived dataset, bench '
                  'protocol identical to BENCH (min-of-2, third sample on >2x disagreement, noop sink, blocking '
                  'cache release, name-sorted order), FOLDED across runs (min of mins, n summed; regenerating '
                  'never drops rows earlier runs contributed). ratio/exponent vs the committed sf0.1 per-query '
                  'record; exponent_%s = log10(t_%s/t_sf0.1)/log10(%d), so 1.0 = linear PER DECADE and rows at '
                  'every scale compare directly. Queries under ~0.3s at sf0.1 sit on fixed job overhead and '
                  'their exponents are noise, not scaling.')
                 % (label, label, label, label, scale)) + what_extra,
        'headline': (('%d queries, %.1f s min-sum at %s vs the sf0.1 record (%.1f s over the %d common queries) '
                      '- %.1fx cost for %dx data, aggregate per-decade exponent %.2f. Worst per-decade exponent '
                      'on a >0.3s base: %s at %.2f. The super-linear tail is the deliberately fixed-geometry ANN '
                      'contrast gates (nCentroids=16 pinned while the query set grows with the corpus - per-query '
                      'scan cost grows linearly AND |Q| grows linearly, so up to 2.0 is the naive ceiling): %s, '
                      '%s, %s. Their scale-path counterparts hold at or near the 1.0 that |Q| growth alone '
                      'dictates: %s, %s, %s.') % (
                        len(queries), total, label, sf01_total, len(common),
                        cost_ratio, scale, agg_exp, worst[0], worst[1],
                        exp_of('ann_pq_topk'), exp_of('ann_ivfpq_rerank_p8'),
                        exp_of('ann_ivfpq_topk'), exp_of('ann_auto_geometry'),
                        exp_of('ann_auto_rerank'), exp_of('ingest_pipeline'))
                     ) + headline_extra,
        'sf01_total_common_sec': round(sf01_total, 1),
        'cost_ratio_%s' % label: round(cost_ratio, 2),
        'aggregate_exponent_per_decade': round(agg_exp, 2),
        'setup_sec': {k: round(v, 1) for k, v in setup.items()},
        'dataset': dataset_desc,
        'total_min_sum_sec': round(total, 1),
        'queries': queries,
    }
    if errors:
        out['errors'] = errors
        out['headline'] += (' ERRORED at %s with no clean timing from any '
                            'source: %s.' % (label, ', '.join(sorted(errors))))
    json.dump(out, open(out_path, 'w'), indent=1, sort_keys=True)
    print('written', len(queries), 'rows; total', round(total, 1), 's; worst',
          worst, '; folded sources:', len(paths))
