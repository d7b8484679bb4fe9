"""Pallas TPU kernels for profiling-identified hot ops."""
