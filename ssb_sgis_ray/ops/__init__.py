"""Dataset-level operators (Ray Data plans built from geo/ kernels)."""
