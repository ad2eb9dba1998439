"""TPU compute ops: attention, scans, convs, windows, losses' kernels."""
