"""Driver simulation — runs the grading driver's exact contract with a
VANILLA SparkSession (not our tuned factory): entry() smoke, then every
queries()[name] vs oracle_sql()[name] at $DRIVE_SF (default sf0.01).

Usage: python tools/drive.py [name ...]   # no args = full registry
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

import __spark_entry__ as e  # noqa: E402
from tests.parity import assert_parity  # noqa: E402

sf_dir = os.environ.get("DRIVE_SF", "/root/testdata/sf0.01")
only = set(sys.argv[1:])

rows = e.entry(spark).collect()
print(f"entry: {len(rows)} rows OK", flush=True)

queries = e.queries()
oracles = e.oracle_sql()
failed = []
for name, fn in queries.items():
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        df = fn(spark, sf_dir)
        if name in oracles:
            assert_parity(df, oracles[name], sf_dir, name)
            status = "parity"
        else:
            n = df.count()
            assert n >= 0
            status = f"rows-only({n})"
        print(f"  {name}: {status} OK ({time.time() - t0:.1f}s)", flush=True)
    except Exception as ex:
        failed.append(name)
        print(f"  {name}: FAIL {ex}", flush=True)
        traceback.print_exc()

print(f"\n{len(failed)} failed of {len(only) or len(queries)}")
if failed:
    print("FAILED:", failed)
    sys.exit(1)
