"""Driver entry point: delegates to psvo_tpu.benchmark (prints ONE JSON line)."""

import sys

from psvo_tpu.benchmark import main

if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="fhn_fivo_k1024_bench")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument(
        "--all",
        action="store_true",
        help="measure every BASELINE config; write BENCH_ALL.json",
    )
    a = ap.parse_args()

    from psvo_tpu.benchmark import device_preflight

    err = device_preflight()
    if err is not None:
        # Honest bounded failure instead of an unkillable hang: the driver
        # records this line; a healthy device is never masked (the probe
        # only fails after repeated timeouts of a trivial matmul roundtrip).
        import json

        print(
            json.dumps(
                {
                    "metric": "train_steps_per_sec_fhn_fivo_k1024_bench",
                    "value": 0,
                    "unit": "steps/s",
                    "vs_baseline": None,
                    "error": f"accelerator unreachable: {err}",
                }
            )
        )
        sys.exit(1)
    if a.all:
        from psvo_tpu.benchmark import main_all

        sys.exit(main_all(a.steps))
    sys.exit(main(a.preset, a.steps))
