"""One-number host-speed gauge for bench attribution: single matmul
GFLOPS. This box (shared hypervisor) swings 4-5x under sibling-VM load
with loadavg and /proc/stat steal staying low, so wall-clock benches are
only comparable at similar gauge readings. Quiet readings on this VM:
~40+ GFLOPS; degraded: <15."""
import time

import numpy as np

a = np.random.rand(2000, 2000)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    a @ a
    best = min(best, time.perf_counter() - t0)
print(round(2 * 2000**3 / best / 1e9, 1))
