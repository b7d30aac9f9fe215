"""Measure per-core kernel rate with k peer cores busy (no Spark):
isolates the dual-core-turbo / all-core-clock hardware effect from any
framework scaling question."""
import multiprocessing as mp
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np

def peer(stop):
    x = np.arange(1_000_000)
    while not stop.is_set():
        (x * 3 + 1) % 97

def measure():
    from crumble_spark import synth
    from crumble_spark.encode import encode_flat
    rows = [synth.gen_row(42, i, mean_len=1024) for i in range(4000)]
    arrays = [r[1] for r in rows]
    offsets = np.concatenate(([0], np.cumsum([len(a) for a in arrays]))).astype(np.int64)
    flat = np.concatenate(arrays)
    n = len(flat)
    encode_flat(flat, offsets, 4096)
    best = 1e9
    for _ in range(3):
        t0 = time.time(); encode_flat(flat, offsets, 4096); best = min(best, time.time()-t0)
    return n / best / 1e6

if __name__ == "__main__":
    for busy in (1, 7, 31):
        stop = mp.Event()
        procs = [mp.Process(target=peer, args=(stop,)) for _ in range(busy)]
        for p in procs: p.start()
        time.sleep(2)
        rate = measure()
        stop.set()
        for p in procs: p.join()
        print(f"{busy+1:2d} cores busy: measured core runs at {rate:.2f} M tok/s")
