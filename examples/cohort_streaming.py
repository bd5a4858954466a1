#!/usr/bin/env python
"""Stream a cohort of CT volumes through one inferer with overlapped
decode / device compute / write stages.

    python examples/cohort_streaming.py OUT_DIR INPUT [INPUT ...]
"""

import sys

from lungmask_tpu import LMInferer
from lungmask_tpu.runtime.cohort import run_cohort


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    out_dir, inputs = sys.argv[1], sys.argv[2:]

    inferer = LMInferer(batch_size=32, tqdm_disable=True)
    stats = run_cohort(
        inputs,
        inferer,
        output_dir=out_dir,
        on_result=lambda r: print(
            f"  {r.name}: {'ok' if r.error is None else r.error} ({r.seconds:.1f}s)"
        ),
    )
    print(
        f"{len(stats.results)} volumes in {stats.wall_seconds:.1f}s "
        f"→ {stats.volumes_per_hour:.0f} volumes/hour"
    )


if __name__ == "__main__":
    main()
