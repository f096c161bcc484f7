#!/usr/bin/env python3
"""Builds BENCH_x30.json — the FULL-SUITE x30 scale record. FOLD-PRESERVING:
the existing BENCH_x30.json is always folded in, so a regeneration can never
drop rows earlier runs appended (see tools/bench_record.py).

Producing commands:
  sbt "runMain graft.tools.ScaleGen /root/testdata/sf0.1 target/testdata-sf3 30"
  SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=target/testdata-sf3 \
    sbt "runMain graft.Bench" > /tmp/bench_x30.log

Usage: mk_bench_x30.py [capture_or_record ... [--sf01 sf01_record]]
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
    scale=30,
    out_path='/root/repo/BENCH_x30.json',
    sources=args,
    sf01_record=sf01,
    dataset_desc=('target/testdata-sf3 (ScaleGen x30 of /root/testdata/sf0.1; '
                  'lexically-disjoint document copies, perturbed embedding copies)'))
