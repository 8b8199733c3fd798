"""Quick memory-bandwidth probe for this sandbox.

The VM intermittently drops to ~1% of normal DRAM bandwidth (cache-
resident compute stays fast) — any benchmark taken in that state is
garbage.  Run this before timing anything; healthy ≈ 0.05-0.2 s,
degraded ≈ 30-100 s.
"""

import time

import numpy as np

t0 = time.time()
x = np.arange(20_000_000)
y = x * 3 + 1
secs = time.time() - t0
state = "HEALTHY" if secs < 1.0 else ("SLOW" if secs < 10 else "DEGRADED")
print(f'{{"probe": "vec20M", "secs": {secs:.2f}, "state": "{state}"}}')
