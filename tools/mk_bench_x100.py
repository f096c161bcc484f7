#!/usr/bin/env python3
"""Builds BENCH_x100.json — the FULL-SUITE x100 scale record, a full decade
past x10. FOLD-PRESERVING: the existing BENCH_x100.json is always folded in,
so a regeneration can never drop rows earlier runs appended (see
tools/bench_record.py).

Producing commands:
  sbt "runMain graft.tools.ScaleGen /root/testdata/sf0.1 target/testdata-sf10 100"
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=target/testdata-sf10 \
    sbt "runMain graft.Bench" > /tmp/bench_x100.log

Usage: mk_bench_x100.py [capture_or_record ... [--sf01 sf01_record]]
"""
import sys

import bench_record

args = sys.argv[1:]
sf01 = '/root/repo/bench_queries.json'
if '--sf01' in args:
    i = args.index('--sf01')
    sf01 = args[i + 1]
    args = args[:i] + args[i + 2:]

bench_record.build(
    scale=100,
    out_path='/root/repo/BENCH_x100.json',
    sources=args,
    sf01_record=sf01,
    dataset_desc=('target/testdata-sf10 (ScaleGen x100 of /root/testdata/sf0.1; '
                  'lexically-disjoint document copies, perturbed embedding copies)'))
