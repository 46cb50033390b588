"""Device compute substrate: JAX/XLA/Pallas kernels for the dense math."""
