"""JAX environment setup for the device compute path.

f64 is required: the reference computes autocorrelation and Levinson in f64
(``/root/reference/src/lpc.rs:916``), and quantization must see the same
precision. Importing this module (done by every device op module) enables
x64 before any tracing happens.
"""

import jax

jax.config.update("jax_enable_x64", True)
