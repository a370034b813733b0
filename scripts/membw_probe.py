"""Host memory-bandwidth probe backing BASELINE.md's scaling attribution.

Launches W pinned single-core streaming workers (each sums a 512 MB float64
array for ~5 s) and reports per-core and aggregate effective bandwidth at
each width. Run at widths 1/4/16 to get the curve that bounds ANY
bandwidth-heavy job's N→4N scaling efficiency on this box:

    python scripts/membw_probe.py 4
    python scripts/membw_probe.py 16

Round-4 measurements (quiet box, BASELINE.md "Dedup-family scaling"):
width 4 = 2.94 GB/s/core (11.8 aggregate), width 16 = 1.11 GB/s/core
(17.8 aggregate) — the memory subsystem saturates near 18 GB/s, so a
purely bandwidth-bound job cannot exceed 4→16 efficiency ≈ 0.38 here
regardless of software shape. Compare the pure-compute spin-probe ceiling
of ≈0.78 (frequency scaling): real operators land between the two bounds
according to their bytes-touched-per-row, which is why shrinking
allocations (e.g. dedup.with_hashed_shingles hashing token slices instead
of building shingle strings) improves SCALING and not just constants.
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
from pathlib import Path

_WORKER = """
import numpy as np, time
a = np.ones(64 * 1024 * 1024, dtype=np.float64)  # 512 MB stream
t0 = time.monotonic(); reps = 0
while time.monotonic() - t0 < 5:
    a.sum(); reps += 1
dt = time.monotonic() - t0
print(f"{reps * a.nbytes / dt / 1e9:.3f}")
"""


def main() -> None:
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    with tempfile.TemporaryDirectory(prefix="membw_") as tmp:
        script = Path(tmp) / "w.py"
        script.write_text(_WORKER)
        procs = [
            subprocess.Popen(
                ["taskset", "-c", str(i), sys.executable, str(script)],
                stdout=subprocess.PIPE, text=True,
            )
            for i in range(width)
        ]
        rates = [float(p.communicate()[0].strip()) for p in procs]
    agg = sum(rates)
    print(f"width {width}: aggregate {agg:.1f} GB/s, per-core {agg / width:.2f} GB/s")


if __name__ == "__main__":
    main()
