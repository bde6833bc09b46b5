"""Native (C++) host components, built on demand with the system g++.

The compiled library is cached next to the sources; import falls back
gracefully (native_available() == False) when no compiler is present.
"""

from .build import load_library, native_available  # noqa: F401
