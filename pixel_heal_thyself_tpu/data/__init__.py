"""Host-side data pipeline: EXR IO, importance-sampled patch extraction,
HDF5 patch store, prefetching device feed, synthetic scene generator."""
