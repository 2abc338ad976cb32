"""Native (C++) host-side runtime components.

The reference delegates its host-side heavy lifting to external native
runtimes (Isaac Gym's C++/PhysX core, the FBX SDK, mujoco-py). This package
holds the framework's own native pieces — built on demand with the local
toolchain, consumed through ctypes, and always paired with a pure-JAX
fallback so nothing hard-depends on a compiler being present.
"""

from .ballsim import (native_available, simulate_flight_native,  # noqa: F401
                      build_library)
