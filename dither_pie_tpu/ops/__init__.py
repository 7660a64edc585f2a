"""Device-side dither operators (XLA-fused ops and Pallas kernels)."""
