"""Build the native oracle shared library on demand.

Compiles oracle.cpp with g++ -O3 into libseqalign_oracle.so next to this
file.  Rebuilds automatically when the source is newer than the binary.
"""

from __future__ import annotations

import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
SOURCE = os.path.join(_DIR, "oracle.cpp")
LIBRARY = os.path.join(_DIR, "libseqalign_oracle.so")

_lock = threading.Lock()


def ensure_built() -> str:
    """Return the path to the built shared library, compiling if needed."""
    with _lock:
        if (
            not os.path.exists(LIBRARY)
            or os.path.getmtime(LIBRARY) < os.path.getmtime(SOURCE)
        ):
            # Link to a temp path and rename: `g++ -o LIBRARY` truncates
            # the existing inode in place, which segfaults any process
            # that already has the old library mmap'd.  os.replace keeps
            # the old inode alive for them and atomically publishes the
            # new build (observed: a concurrent pytest run died with
            # SIGSEGV mid-suite when the .so was rebuilt under it).
            tmp = LIBRARY + f".tmp.{os.getpid()}"
            cmd = [
                "g++",
                "-O3",
                "-march=native",
                "-std=c++17",
                "-shared",
                "-fPIC",
                "-o",
                tmp,
                SOURCE,
            ]
            try:
                subprocess.run(
                    cmd, check=True, capture_output=True, text=True
                )
                os.replace(tmp, LIBRARY)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
    return LIBRARY


if __name__ == "__main__":
    print(ensure_built())
