"""Custom TPU ops: Pallas kernels and folded-inference executors."""
