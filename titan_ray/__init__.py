"""titan_ray — Ray-Data-native transcript quality-control engine.

Re-expresses the reference QC battery (metno/TITAN, see SURVEY.md) as
streaming Ray Data pipelines over Arrow batches.
"""


def tune_malloc() -> None:
    """Keep glibc from mmap'ing/munmap'ing every large numpy temporary.

    The vectorized scorers allocate tens-of-MB transients per batch; with the
    default dynamic mmap threshold each call triggers mmap+page-fault+munmap
    (+ cross-CPU TLB shootdowns), which measured ~60x slower under concurrent
    Ray workers on this VM. Raising the thresholds makes the heap grow once
    and stay warm.
    """
    try:
        import ctypes

        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
    except Exception:
        pass


tune_malloc()
