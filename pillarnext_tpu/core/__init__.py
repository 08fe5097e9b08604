"""Core geometry: host NumPy ops, on-device JAX ops, native C++ kernels."""

from pillarnext_tpu.core import box_ops, gaussian, jax_box_ops, native_geometry, nms

__all__ = ["box_ops", "gaussian", "jax_box_ops", "native_geometry", "nms"]
