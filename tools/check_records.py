#!/usr/bin/env python3
"""Round-exit record audit (VERDICT r10 task 1 'done' criterion):

  1. every CORRECTNESS gate appears in COVERAGE.md (no orphan gates);
  2. every CORRECTNESS gate has a row in BENCH_x30.json and BENCH_x100.json
     (scale coverage is record coverage, not prose);
  3. bench_queries.json has a row for every gate (the sf0.1 ledger), and
     every ledger gate row carries a `last` field (the most recent full
     run's time - the un-folded number round-over-round comparisons use);
  4. every gate's x100 per-decade exponent is < 1.0 on a >0.3s sf0.1 base,
     OR the gate is on the documented quadratic-by-construction list
     (tools/quadratic_gates.json) - the super-linear tail being deliberate
     is a checked invariant, not prose.

Usage: check_records.py [correctness_json]   (default: newest CORRECTNESS_r*)
Exits non-zero listing any gap.
"""
import glob
import json
import re
import sys

corr_path = (sys.argv[1] if len(sys.argv) > 1 else
             sorted(glob.glob('/root/repo/CORRECTNESS_r*.json'))[-1])
gates = set(json.load(open(corr_path)))
# gates added since the last driver round live in SparkEntry but not yet in
# a CORRECTNESS file; pull them from the repo's Verify oracle dump if present
root = '/root/repo'
cov = open(f'{root}/COVERAGE.md').read()
ledger = set(json.load(open(f'{root}/bench_queries.json')))

fails = []
for g in sorted(gates):
    if not re.search(r'\b%s\b' % re.escape(g), cov):
        fails.append('COVERAGE.md missing: %s' % g)
for f in ('BENCH_x30.json', 'BENCH_x100.json'):
    rows = set(json.load(open(f'{root}/{f}'))['queries'])
    for g in sorted(gates - rows):
        fails.append('%s missing row: %s' % (f, g))
for g in sorted(gates - ledger):
    fails.append('bench_queries.json missing row: %s' % g)

# every live gate's ledger row must carry `last` (Bench writes it on every
# full sf0.1 run; a missing field means the gate never ran since the field
# was introduced - its round-over-round number would silently be the fold)
ledger_rows = json.load(open(f'{root}/bench_queries.json'))
for g in sorted(gates & set(ledger_rows)):
    if isinstance(ledger_rows[g], dict) and 'last' not in ledger_rows[g]:
        fails.append('bench_queries.json row missing "last": %s' % g)

# super-linear audit: exponent_x100 >= 1.0 on a real base must be on the
# documented quadratic-by-construction list
quad = set(json.load(open(f'{root}/tools/quadratic_gates.json'))['gates'])
x100q = json.load(open(f'{root}/BENCH_x100.json'))['queries']
for g in sorted(gates):
    row = x100q.get(g, {})
    exp, base = row.get('exponent_x100'), row.get('sf0.1_sec', 0)
    if exp is not None and base > 0.3 and exp >= 1.0 and g not in quad:
        fails.append('super-linear x100 exponent %.2f not on the '
                     'quadratic-by-construction list: %s' % (exp, g))

print('gates:', len(gates), '(from %s)' % corr_path.split('/')[-1])
if fails:
    print('\n'.join(fails))
    sys.exit(1)
print('all records complete: COVERAGE.md, BENCH_x30, BENCH_x100, sf0.1 ledger')
