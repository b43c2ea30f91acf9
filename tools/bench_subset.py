"""Run a subset of bench entries through bench._run (the exact harness
timing path). Usage:
  python tools/bench_subset.py entry1,entry2 [cpus] [reps]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

names = set(sys.argv[1].split(","))
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

mins, meds = bench._run(sf_dir, cpus, names, reps, reps)
print(json.dumps({"min": mins, "median": meds}))
