"""Run EVERY queries() entry end-to-end (rows-only smoke, no oracle) —
the strongest pre-driver check: `python tools/sweep_queries.py [sf_dir]`.

check_oracles.py covers the 29 DuckDB-hash-checked queries; this sweeps
the full dict (mosaic family, dedup/LSH/ANN, multimodal, sketches) the
way the driver does, catching breakage in rows-only pipelines."""

import sys
import time

import ray


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    ray.init(address="local", include_dashboard=False,
             ignore_reinit_error=True, log_to_driver=False)
    import ray.data as rd

    sys.path.insert(0, ".")
    import __ray_entry__ as e

    qs = e.queries()
    fails = []
    for i, (name, fn) in enumerate(qs.items()):
        t0 = time.time()
        try:
            r = fn(sf_dir)
            n = r.count() if isinstance(r, rd.Dataset) else len(r)
            print(f"[{i + 1:2d}/{len(qs)}] OK   {name}: {n} rows "
                  f"({time.time() - t0:.1f}s)", flush=True)
        except Exception as ex:  # noqa: BLE001 - report-and-continue sweep
            fails.append(name)
            print(f"[{i + 1:2d}/{len(qs)}] FAIL {name}: "
                  f"{type(ex).__name__}: {ex}", flush=True)
    print(f"{len(qs) - len(fails)}/{len(qs)} queries OK"
          + (f"; FAILURES: {fails}" if fails else ""))
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
