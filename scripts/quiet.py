#!/usr/bin/env python
"""Block until the host is probed-quiet (3 consecutive calibration samples
below threshold), then exit 0. Prints samples. Timeout -> exit 1."""
import sys, time
thr = float(sys.argv[1]) if len(sys.argv) > 1 else 1.25
timeout = float(sys.argv[2]) if len(sys.argv) > 2 else 1800
def calib():
    t0=time.perf_counter()
    x=0x9E3779B97F4A7C15; acc=0
    for _ in range(4_000_000):
        x^=(x<<13)&0xFFFFFFFFFFFFFFFF; x^=x>>7; x^=(x<<17)&0xFFFFFFFFFFFFFFFF; acc^=x
    assert acc != 0
    return time.perf_counter()-t0
deadline=time.time()+timeout
streak=0
while time.time()<deadline:
    c=calib()
    print(f"{c:.3f}", flush=True)
    streak = streak+1 if c<thr else 0
    if streak>=3:
        sys.exit(0)
    if c>=thr: time.sleep(8)
sys.exit(1)
