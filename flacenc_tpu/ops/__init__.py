"""Compute kernels.

``*_np`` modules are scalar-faithful numpy implementations of the reference
semantics (the parity oracle and the spec for the device kernels); the
plain modules are the batched JAX/XLA device implementations.
"""
