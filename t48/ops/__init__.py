"""Hand-written TPU kernels (Pallas)."""
