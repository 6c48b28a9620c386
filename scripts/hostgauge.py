"""One-number host-speed gauge for bench attribution: single matmul
GFLOPS. This box (shared hypervisor) swings 4-5x under sibling-VM load
with loadavg and /proc/stat steal staying low, so wall-clock benches are
only comparable at similar gauge readings. Quiet readings on this VM:
~40+ GFLOPS; degraded: <15.

The measurement itself lives in bench.host_gflops so the standalone
gauge and the readings embedded in bench JSON are identical."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import host_gflops  # noqa: E402

print(host_gflops())
