"""Fused Pallas TPU kernels for the DMEL hot path."""
