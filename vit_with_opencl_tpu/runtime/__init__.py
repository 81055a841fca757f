"""Native runtime layer: C++ IO library with ctypes bindings.

Builds ``libvitio.so`` from ``vitio.cpp`` on first use (g++, -O3) and exposes
the loaders/comparator with the same semantics as the pure-NumPy io layer.
``io.binfmt`` remains the portable fallback; this is the production data path
(the role the reference's C host IO plays — Network.c, dirent.c, Main.c's
emitter, comparator.c).
"""

from .native import (  # noqa: F401
    NativeIO,
    get_native_io,
    native_available,
)
