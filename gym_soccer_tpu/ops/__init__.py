"""Low-level device kernels (pallas).

The generic XLA path (core/batch.py) already exceeds the 10M steps/s
target; kernels here push toward speed-of-light.  See step_kernel.py.
"""
