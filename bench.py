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
    if a.all:
        from psvo_tpu.benchmark import main_all

        sys.exit(main_all(a.steps))
    sys.exit(main(a.preset, a.steps))
