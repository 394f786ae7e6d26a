"""Per-stage host-prep cost report at bench scale.

Runs one bench e2e pass (TPU env intact) over the captured frame set and
prints the SwitchableTimer registry's p50 per stage — attributes the
`prep_ms_p50` / `pack_ms_p50` bench numbers to their sub-stages
(VERDICT r4 #4: host prep+pack must get under 8 ms combined, and the
cut has to start from a measurement).

Usage:
    python tools/profile_host.py            # TPU (axon env intact)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FRAMES = "/tmp/okvis2_bench_frames_v2.npz"


def main():
    import numpy as np

    import bench
    from okvis2_tpu.utils.timing import Timing

    data = np.load(FRAMES)
    res, _slam = bench.run_e2e(data, tag="e")
    print(f"[host] e2e {res['e2e_fps']:.1f} fps "
          f"(p50 {res['e2e_ms_p50']:.1f} ms)", flush=True)
    Timing.print_report()


if __name__ == "__main__":
    main()
