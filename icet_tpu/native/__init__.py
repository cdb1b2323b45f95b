"""Native host runtime bindings (C extension, see icet_native.c).

``ensure_built()`` compiles the extension in-place on first use (cached);
consumers fall back to the pure-python loaders when a toolchain is missing.
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.abspath(__file__))
_mod = None
_tried = False


def ensure_built(quiet: bool = True):
    """Import the C extension, building it in-place if needed.

    Returns the module, or None if a build is impossible here.
    """
    global _mod, _tried
    if _mod is not None or _tried:
        return _mod
    _tried = True
    if _DIR not in sys.path:
        sys.path.insert(0, _DIR)
    try:
        import _icet_native  # noqa: F401

        _mod = sys.modules["_icet_native"]
        return _mod
    except ImportError:
        pass
    try:
        subprocess.run(
            [sys.executable, "setup.py", "build_ext", "--inplace"],
            cwd=_DIR,
            check=True,
            capture_output=quiet,
        )
        import _icet_native  # noqa: F401

        _mod = sys.modules["_icet_native"]
    except Exception as e:  # toolchain missing / build failed
        if not quiet:
            print(f"icet_native build failed: {e}", file=sys.stderr)
        _mod = None
    return _mod


class NativeReplaySource:
    """Drop-in for datasets.replay.ReplaySource backed by the native ordered
    prefetch queue: file IO and padding happen in C producer threads while
    the consumer runs the solver."""

    def __init__(
        self,
        pattern: str,
        max_points: int = 131072,
        n_threads: int = 2,
        depth: int = 4,
        loop: bool = False,
        repeat: int = 0,
    ):
        native = ensure_built()
        if native is None:
            raise RuntimeError(
                "native extension unavailable; use datasets.replay.ReplaySource"
            )
        if os.path.isdir(pattern):
            pattern = os.path.join(pattern, "*")
        self.paths = sorted(
            p
            for p in glob.glob(pattern)
            if os.path.isfile(p)
            and os.path.splitext(p)[1] in (".npy", ".bin", ".csv", ".txt")
        )
        if not self.paths:
            raise FileNotFoundError(
                f"no .npy/.bin/.csv/.txt files match {pattern}"
            )
        self._native = native
        self._args = dict(
            paths=self.paths,
            max_points=max_points,
            n_threads=n_threads,
            depth=depth,
            loop=loop,
            repeat=repeat,
        )

    def __len__(self):
        return len(self.paths)

    def __iter__(self):
        q = self._native.make_prefetcher(**self._args)
        try:
            while True:
                try:
                    scan, _n = q.next_scan()
                except StopIteration:
                    return
                yield scan
        finally:
            q.close()
