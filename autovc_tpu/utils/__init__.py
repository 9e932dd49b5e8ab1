"""Small shared utilities (file discovery, console formatting, progress).

Mirrors the contracts of ``autovc/utils/__init__.py:4-106``.
"""
from __future__ import annotations

import os
import sys


def retrieve_file_paths(paths, excluded=(), extensions=(".wav",)):
    """Recursively resolve a path / list of paths into a sorted list of audio
    files, skipping anything under ``excluded`` (utils/__init__.py:4-34)."""
    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    excluded = [os.path.normpath(str(e)) for e in
                ([excluded] if isinstance(excluded, (str, os.PathLike))
                 else excluded)]

    def is_excluded(p):
        p = os.path.normpath(p)
        return any(p == e or p.startswith(e + os.sep) for e in excluded)

    out = []
    for p in paths:
        p = str(p)
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for f in sorted(files):
                    full = os.path.join(root, f)
                    if f.lower().endswith(extensions) and not is_excluded(full):
                        out.append(full)
        elif os.path.isfile(p):
            if not is_excluded(p):
                out.append(p)
        else:
            raise FileNotFoundError(f"No such file or directory: {p}")
    return sorted(out)


class pformat:
    """ANSI colour codes (utils/__init__.py:36-48)."""
    PURPLE = "\033[95m"
    CYAN = "\033[96m"
    BLUE = "\033[94m"
    GREEN = "\033[92m"
    YELLOW = "\033[93m"
    RED = "\033[91m"
    BOLD = "\033[1m"
    UNDERLINE = "\033[4m"
    END = "\033[0m"


def progbar(i, n, info=None, size=16):
    """Minimal textual progress bar (utils/__init__.py:50-68)."""
    done = int(size * i / max(n, 1))
    bar = "█" * done + "░" * (size - done)
    msg = f"\r{i}/{n} |{bar}| "
    if info:
        msg += " ".join(f"{k}: {v}" for k, v in info.items())
    stream(msg)


def close_progbar():
    stream("\n")


def stream(message):
    sys.stdout.write(message)
    sys.stdout.flush()
