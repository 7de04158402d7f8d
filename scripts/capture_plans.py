"""Capture .explain("formatted") for driver queries into plans/<tag>/.

Usage:
    python scripts/capture_plans.py <tag> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix from $PLAN_SUFFIX, default
"before").  With no query args, captures every entry in queries().

Note: building some query DataFrames runs their training actions (BPE,
classifier, k-means) — that is inherent to their shape; the captured plan is
the final scoring/output plan.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r09"
    wanted = sys.argv[2:]
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as entry
    from docling_core_spark.session import get_spark

    spark = get_spark(app_name="capture-plans", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    qs = entry.queries()
    names = wanted or list(qs)
    for name in names:
        fn = qs[name]
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            text = f"ERROR building plan: {e}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_exchange = text.count("Exchange")
        print(f"{name}: {len(text)}B, Exchange x{n_exchange} -> {path}")


if __name__ == "__main__":
    main()
