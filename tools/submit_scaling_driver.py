"""spark-submit driver for one scaling-level measurement.

Launched as:

    spark-submit --master local[N] --py-files dist/simages_spark.zip \
        tools/submit_scaling_driver.py --cores N --n-docs M

Deliberately contains NO sys.path setup and is run with cwd OUTSIDE the
repo and a scrubbed PYTHONPATH (see bench_scaling.py --submit): every
`simages_spark` import must resolve from the --py-files zip — the same
mechanism that ships the package to executors on a real cluster. The
result JSON embeds `import_provenance` so the from-zip claim is recorded
evidence, not an assumption.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--n-docs", type=int, required=True)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from simages_spark.benchmarks import import_provenance, measure_scaling

    prov = import_provenance()
    if not prov["from_zip"]:
        raise SystemExit(
            f"simages_spark imported from {prov['path']!r}, not the "
            "--py-files zip — the measurement would not prove the "
            "shipped artifact is runnable"
        )
    print("RESULT " + json.dumps(measure_scaling(args.cores, args.n_docs, args.reps)))


if __name__ == "__main__":
    main()
