"""Pallas TPU kernels for the framework's hot ops.

Each kernel has a pure-jnp reference twin in `opensfm_tpu.ops.*`; callers
dispatch to the Pallas path on TPU backends and fall back to jnp elsewhere
(tests run the kernels in interpreter mode against the jnp twins).
"""

from opensfm_tpu.ops.pallas_kernels.top2 import top2_sqdist_pallas  # noqa: F401
