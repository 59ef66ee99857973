"""Pure numpy/Arrow geometry kernels. No Ray imports in this layer."""
