"""Capture .explain('formatted') for named queries into plans/<outdir>/.

Usage: python tools/explain_capture.py <outdir> <suffix> <query> [...]
(e.g. `python tools/explain_capture.py plans/r13 before ivf_recall_sweep`).
Repo root is resolved from this file, so the same script runs from a
detached worktree to capture before-plans at an older commit.
"""

from __future__ import annotations

import io
import os
import sys

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, root)


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entrymod
    from flink_uba_spark.session import get_spark

    spark = get_spark("explain")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        stdout, sys.stdout = sys.stdout, buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
