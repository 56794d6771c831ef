"""Pallas TPU kernels — the hand-scheduled alternative to XLA's native
lowerings for the quantized hot path. Selected via ORIET_KERNELS=pallas."""
