"""Honor `JAX_PLATFORMS=cpu python script.py` on the dev host.

The axon sitecustomize prepends its platform to jax_platforms even when
the env says cpu (same issue tests/conftest.py works around); making the
config update after import is authoritative. Import this before any
other jax-importing module in experiment scripts.
"""

import os

import jax

_want = os.environ.get("JAX_PLATFORMS", "").strip()
if _want and "axon" not in _want:
    jax.config.update("jax_platforms", _want)
